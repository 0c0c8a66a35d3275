"""Trace-aware jit: inline under an enclosing trace, jit when eager.

Every Pallas kernel entry point used to be its own ``@jax.jit``. That
nested-jit (pjit call) boundary miscompiled on TPU when the enclosing
jit's trace also computed the scene constant tables: the XLA:TPU program
returned all-miss (t=BIG, idx=-1 for every ray) for the tile kernel's
"hier" cull pre-pass, while the identical graph inlined into the outer
trace — or called with eagerly-materialized constants — was exact
(measured round 5, scripts/probe_hier_min.py, n>=4096 rays on the cfg5
100k-triangle scene).

The fix is structural, not a barrier (``jax.lax.optimization_barrier``
inside the inner jit did NOT help): never introduce a pjit boundary
between in-trace constant production and a kernel call. ``trace_aware``
dispatches on the first argument — a Tracer means we are already inside
someone's jit, so the implementation is inlined; a concrete array means
an eager caller, who still gets one compiled executable via the jitted
twin.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["trace_aware"]


def trace_aware(static_argnames=()):
    """Decorator: jit for eager callers, inline under an active trace."""

    def wrap(fn):
        jitted = jax.jit(fn, static_argnames=static_argnames)

        @functools.wraps(fn)
        def dispatch(*args, **kwargs):
            target = fn if isinstance(args[0], jax.core.Tracer) else jitted
            return target(*args, **kwargs)

        dispatch.jitted = jitted
        dispatch.impl = fn
        dispatch.clear_cache = jitted.clear_cache
        return dispatch

    return wrap

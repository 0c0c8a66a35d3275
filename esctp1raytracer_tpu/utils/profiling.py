"""Profiling: per-phase timers + jax.profiler trace capture.

The reference's only instrumentation is two wall-clock timers printed to
stderr (src/main.cpp:569-579, :645-654). Here: the same phase timers
(utils/timing.py) plus real device profiling — `trace()` wraps a region in
a jax.profiler trace (viewable in TensorBoard/Perfetto) and
`annotate()` names sub-regions, so kernel time, HBM traffic and collective
overlap are inspectable per phase.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

from esctp1raytracer_tpu.utils.debug import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region.

    log_dir defaults to $ESCTP_PROFILE_DIR; when neither is set, the
    region runs unprofiled (zero overhead)."""
    log_dir = log_dir or os.environ.get("ESCTP_PROFILE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named sub-region annotation inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def phase(name: str, report: bool = True) -> Iterator[None]:
    """Wall-clock phase timer with device sync, logged at INFO."""
    start = time.perf_counter()
    yield
    # Sync so the phase includes device work (like the reference's
    # synchronous CPU timing).
    try:
        jax.block_until_ready(jax.numpy.zeros(()))
    except Exception:
        pass
    if report:
        logger.info("phase %-16s %8.2f ms", name, (time.perf_counter() - start) * 1e3)

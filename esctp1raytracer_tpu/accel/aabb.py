"""Axis-aligned bounding boxes: the reference's `aabb` class, the jnp way.

Reference: src/scene/aabb.{h,cpp} — min/max box with the classic slab
intersection (aabb.cpp:67-110) returning tnear/tfar. Here the slab test is
a branch-free broadcastable function (and the box-building helpers are
vectorized over whole triangle tables instead of per-primitive expand
calls)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from esctp1raytracer_tpu.scene.types import TriangleBuffer

BIG = jnp.float32(1e30)


def triangle_bounds(tris: TriangleBuffer) -> Tuple[jax.Array, jax.Array]:
    """Per-triangle AABB (bmin, bmax) [N, 3]; padded tris collapse to a
    point at the origin (they are excluded by masks downstream anyway)."""
    v = jnp.stack([tris.v0, tris.v1, tris.v2], axis=1)  # [N, 3, 3]
    return jnp.min(v, axis=1), jnp.max(v, axis=1)


def aabb_intersect(
    o: jax.Array,
    inv_d: jax.Array,
    bmin: jax.Array,
    bmax: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Slab test (broadcastable): returns (tnear, tfar, hit).

    Matches the reference's semantics (aabb.cpp:67-110): hit iff the
    [tnear, tfar] interval is non-empty with tfar >= 0. `inv_d` is the
    per-component reciprocal direction (the reference's inverseVector,
    src/simplify/c_vec.c).
    """
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tnear = jnp.max(tsmall, axis=-1)
    tfar = jnp.min(tbig, axis=-1)
    hit = (tnear <= tfar) & (tfar >= 0.0)
    return tnear, tfar, hit

"""Shared block-culling pre-pass utilities for the ray-tile kernels.

Every device kernel family (tile, mxtile, and the retired bundle kernel
they originated in) culls the same way: an XLA pre-pass slab-tests rays
against Morton-block AABBs and compacts, per COHERENT-ray bundle, the
blocks that could contain a hit into an ascending list + count. The
kernel then loops exactly `cnt` blocks — culling by *loop bound*, which
the scalar unit honors unconditionally (the framework's measured
architectural rule: in-kernel early exits lose to pipelined fixed
sweeps, ROOFLINE.md). This is the framework's equivalent of the culling
role of the reference BVH (src/main.cpp:98-171).

These utilities lived in kernels/hit_pallas.py (the round-1 "bundle"
kernel: 1 ray x 1024-triangle vector tiles). Round-by-round measurement
found the bundle kernel winning no regime — lane beats it under 4k
triangles, mxtile from 4k-32k, tile beyond (ROOFLINE.md) — so round 5
retired its search/occlusion kernels and moved the pre-pass machinery,
its one live export, here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COHERENT = 8  # rays per bundle sharing one culled block list


def block_cull_mask(o: jax.Array, d: jax.Array, aabbs: jax.Array,
                    t_limit: jax.Array = None,
                    return_entry: bool = False) -> jax.Array:
    """Slab-test rays [R, 3] against block AABBs [8, NB] -> mask [R, NB].

    NaN-safe: a zero direction component whose origin sits exactly on a
    slab plane yields 0 * inf = NaN; the negated comparison form makes
    those lanes fall through to "keep" — a conservative extra block test
    instead of a wrongly culled (potentially hit) block.

    With `t_limit` [R] set (shadow/occlusion rays), blocks whose slab
    entry lies beyond the limit are culled too — the t-ceiling analogue of
    the reference's early-exit occlusion (src/main.cpp:314-329).

    return_entry=True also returns the slab entry t [R, NB] (meaningful
    only where the mask is set) — used to order occlusion block lists
    nearest-first for the any-hit kernel's early exit.
    """
    inv = 1.0 / d  # inf on zero components is correct slab behavior
    bmin = aabbs[0:3].T  # [NB, 3]
    bmax = aabbs[3:6].T
    t0 = (bmin[None] - o[:, None]) * inv[:, None]  # [R, NB, 3]
    t1 = (bmax[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    reject = (tn > tf) | (tf < 0.0)
    if t_limit is not None:
        reject |= tn > t_limit[:, None]
    if return_entry:
        return ~reject, tn
    return ~reject


def group_cull_mask(o: jax.Array, d: jax.Array, aabbs: jax.Array,
                    t_limit: jax.Array = None, group: int = COHERENT
                    ) -> jax.Array:
    """Interval slab test per `group`-ray bundle -> mask [R/group, NB].

    Replaces per-ray `block_cull_mask` + the group OR-fold with ONE
    conservative slab test per bundle built from component intervals
    (min/max of o and d over the group's rays, interval reciprocal of d).
    `group`x fewer slab tests; measured exact-or-near-exact on coherent
    wavefronts (probe_prepass: 0 extra blocks on the 4K x 100k primary,
    +0.1% on the flagship, +0.7% on the 100k shadow wavefront — extra
    blocks cost sweep time only, never correctness, because the kernels
    re-test every triangle).

    Conservative by construction: for each axis the per-bundle entry
    (exit) bound is the min (max) over the interval-corner products, so
    tn <= every ray's slab entry and tf >= every ray's slab exit; a
    direction-component sign flip inside the bundle unbounds that axis.
    NaN lanes (origin exactly on a slab plane x overflowed reciprocal)
    fall through every comparison to "keep" — same conservative direction
    as block_cull_mask's NaN note. With `t_limit` [R], the ceiling is the
    bundle max (rays with t_limit < 0 contribute no ceiling of their own).
    """
    nb = o.shape[0] // group
    ob = o.reshape(nb, group, 3)
    db = d.reshape(nb, group, 3)
    o_lo, o_hi = jnp.min(ob, axis=1), jnp.max(ob, axis=1)
    d_lo, d_hi = jnp.min(db, axis=1), jnp.max(db, axis=1)
    unbounded = (d_lo <= 0.0) & (d_hi >= 0.0)  # sign flip (or exact zero)
    inv_a = 1.0 / jnp.where(unbounded, 1.0, d_hi)
    inv_b = 1.0 / jnp.where(unbounded, 1.0, d_lo)
    inv_lo = jnp.minimum(inv_a, inv_b)
    inv_hi = jnp.maximum(inv_a, inv_b)
    bmin = aabbs[0:3].T  # [NB, 3]
    bmax = aabbs[3:6].T
    big = jnp.float32(3.4e38)
    tn = jnp.full((nb, bmin.shape[0]), -big, jnp.float32)
    tf = jnp.full((nb, bmin.shape[0]), big, jnp.float32)
    for a in range(3):
        lo1 = bmin[None, :, a] - o_hi[:, a:a + 1]
        hi1 = bmin[None, :, a] - o_lo[:, a:a + 1]
        lo2 = bmax[None, :, a] - o_hi[:, a:a + 1]
        hi2 = bmax[None, :, a] - o_lo[:, a:a + 1]
        il, ih = inv_lo[:, a:a + 1], inv_hi[:, a:a + 1]
        p = [lo1 * il, lo1 * ih, hi1 * il, hi1 * ih,
             lo2 * il, lo2 * ih, hi2 * il, hi2 * ih]
        near = p[0]
        far = p[0]
        for q in p[1:]:
            near = jnp.minimum(near, q)
            far = jnp.maximum(far, q)
        unb = unbounded[:, a:a + 1]
        near = jnp.where(unb, -big, near)
        far = jnp.where(unb, big, far)
        tn = jnp.maximum(tn, near)
        tf = jnp.minimum(tf, far)
    reject = (tn > tf) | (tf < 0.0)
    if t_limit is not None:
        # NaN tn compares False here too -> keep (conservative).
        tl_hi = jnp.max(t_limit.reshape(nb, group), axis=1)
        reject |= tn > tl_hi[:, None]
    return ~reject


# Ascending-extraction list cap: bundles needing more than this many
# blocks fall back to the dense iota list (sweep every block) — exact,
# just unculled. Measured p99 list lengths: 3 (4K x 100k), 15 (flagship).
CULL_EXTRACT_K = 32


def extract_lists(gmask: jax.Array, k: int = CULL_EXTRACT_K):
    """Compacted ascending block lists without a sort.

    argsort over NB columns is a full sort network (~40 ms per 1M rays at
    NB=784, probe_prepass); with per-bundle lists this short (p99 <= 15),
    k min-reductions — each a single O(NB) VPU pass extracting the next
    set block id — build the same (ids, cnt) in half the time. Exact for
    cnt <= k; overflow bundles get ids = iota, cnt = NB (sweep-everything
    fallback, conservative-correct). Returns ids [B, NB] (only the first
    cnt entries meaningful), cnt [B].
    """
    nb, ns = gmask.shape
    k = min(k, ns)
    iota = jnp.arange(ns, dtype=jnp.int32)
    big = jnp.int32(ns)
    masked = jnp.where(gmask, iota, big)
    cols = []
    last = jnp.full((nb, 1), -1, jnp.int32)
    for _ in range(k):
        cur = jnp.min(jnp.where(masked > last, masked, big), axis=1,
                      keepdims=True)
        cols.append(cur)
        last = cur
    ids_k = jnp.concatenate(cols, axis=1)  # [B, k] ascending (then ns-pad)
    cnt = jnp.sum(gmask, axis=1).astype(jnp.int32)
    over = cnt > k
    if ns > k:
        tail = jnp.broadcast_to(iota[None, k:], (nb, ns - k))
        ids = jnp.concatenate([ids_k, tail], axis=1)
    else:
        ids = ids_k
    ids = jnp.where(over[:, None], iota[None, :], ids)
    cnt = jnp.where(over, jnp.int32(ns), cnt)
    return ids, cnt

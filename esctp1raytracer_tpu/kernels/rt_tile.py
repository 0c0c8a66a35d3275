"""Ray x triangle tile kernel: 8 rays x 128 triangles per vector op.

The round-1 bundle kernel (retired round 5; its cull machinery lives on
in kernels/cull.py) assigned a vector tile to (1 ray x 1024 triangles),
so its culling granularity was 1024 triangles — and measured on the
flagship scene the mean ray tests ~2.7 such blocks = ~2760 pairs.
Shrinking blocks under the (8, 128) tile doesn't help there: a masked
sub-tile costs the same vector issue slots as a full one.

This kernel transposes the assignment: **sublanes are the bundle's 8
rays, lanes are 128 triangles** — one Morton-sorted sub-block per
fori_loop step. Same 1024 pairs per vector op, but the cull list now
works at 128-triangle granularity, where the same scene measures ~770
pairs/ray — 3.6x fewer (scripts/probe_tile.py re-measures on-chip).
The reduction also gets cheaper than the bundle kernel's per-block
sublane folds: the running (t, index) minimum lives per (ray, lane
slot) across the whole loop, and ONE cross-lane fold per bundle
finishes all 8 rays.

Per sub-block step the 12 constant rows load as (1, 128) slices of a
[NSUB, 16, 128] VMEM table — dynamic indexing on the *untiled* leading
dim (legal in Mosaic) — and broadcast over the 8 ray sublanes; the ray
components broadcast the other way, built once per bundle from SMEM
scalars into (8, 128) registers via sublane-iota selects.

Same acceptance window, tie rule (first in Morton-sorted order), and
pre-pass (block_cull_mask + ascending compacted lists) as the bundle
kernel; reference parity anchors are identical (Möller–Trumbore window
of src/scene/ray_triangle.h:23-47, SPMD loop of src/ispc/trace.ispc:70-84,
culling role of the reference BVH src/main.cpp:98-171).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import dataclasses

from esctp1raytracer_tpu.accel.clusters import build_clusters
from esctp1raytracer_tpu.core.intersect import BIG, NO_HIT
from esctp1raytracer_tpu.utils.tracejit import trace_aware
from esctp1raytracer_tpu.kernels.cull import (
    block_cull_mask,
    extract_lists,
    group_cull_mask,
)
from esctp1raytracer_tpu.scene.types import TriangleBuffer

RAY_GROUP = 128          # rays per grid step (SMEM-resident scalars)
COHERENT = 8             # rays per bundle = the 8 sublanes of a tile
SUB = 128                # triangles per sub-block = the 128 lanes
TILE_TRI_LIMIT = 131_072  # NSUB=1024: [1024,16,128] f32 = 8.4 MB VMEM resident
# (~16 MB/core VMEM total; rays/ids/cnt SMEM + (8, groups) outputs are small,
# so the constant table can take half of VMEM. 1024 sub-blocks covers the
# BASELINE 100k-triangle config in ONE resident segment — no slicing.)

_INT_BIG = np.int32(2**31 - 1)

# Oversized triangles (clusters.OVERSIZE_K x the median AABB diagonal —
# ground planes, area lights) sort into a segregated trailing block
# (clusters.py), which keeps the dense mesh blocks tight. For the
# OCCLUSION pass they are additionally EXCLUDED from the kernel table and
# swept by a one-pass XLA any-hit over at most OVER_CAP of them: their
# shared block AABB (floor + light union) could never be t-limit-culled
# out of a shadow bundle, while outside the kernel the floor dies to the
# slab test's direction check and the light's tight box to the t_limit
# window. For the PRIMARY search they stay in the kernel: one segregated
# block amortized over (8,128) tiles is cheaper than an uncullable
# 2.07M x OVER_CAP XLA argmin sweep (measured +27 ms at the flagship).
OVER_CAP = 128


def _clustered_tables(tris: TriangleBuffer):
    """Cluster-sort + segregate oversized triangles.

    Returns (sorted_tris, perm, exclude [N] bool in sorted order,
    ov_buf TriangleBuffer[OVER_CAP], ov_orig [OVER_CAP] original indices).
    """
    clustered = build_clusters(tris)
    st, perm, ov = clustered.tris, clustered.perm, clustered.oversized
    n = tris.capacity
    pos = jnp.arange(n, dtype=jnp.int32)
    # Sorted layout is [normal | oversized | invalid] (clusters.py keys),
    # so the oversized run starts right after the normal ones; cap the
    # exclusion at OVER_CAP (beyond that they stay in the kernel table).
    n_norm = jnp.sum((st.valid & ~ov).astype(jnp.int32))
    exclude = ov & (pos < n_norm + OVER_CAP)
    idx = jnp.minimum(n_norm + jnp.arange(OVER_CAP, dtype=jnp.int32), n - 1)
    ov_valid = jnp.take(exclude, idx)
    ov_buf = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), st)
    ov_buf = dataclasses.replace(ov_buf, valid=ov_valid)
    ov_orig = jnp.take(perm, idx)
    return st, perm, exclude, ov_buf, ov_orig


# Primary-search pre-hit: sweep the (up to OVER_CAP) oversized triangles
# in XLA first and use the closest hit among them as a t-ceiling for the
# kernel's cull pre-pass. Exact (the ceiling is a real in-table hit), but
# the uncullable [R, OVER_CAP] XLA sweep costs ~tens of ms at wavefront
# scale — off by default pending an on-chip A/B (ROOFLINE round-3).
PRIMARY_PREHIT = False


def _oversized_min_t(o, d, ov_buf: TriangleBuffer, eps):
    """Closest accepted t over the oversized buffer: [R] (BIG = none).

    Same plane-constant formulation as the kernels; any returned t is a
    true upper bound on the global winner because these triangles stay in
    the search table.
    """
    t, ok = _oversized_hits(o, d, ov_buf, eps)
    return jnp.min(jnp.where(ok, t, BIG), axis=1)


def _oversized_hits(o, d, ov_buf: TriangleBuffer, eps):
    """One-pass XLA sweep over the oversized set: (t [R, K], ok [R, K]).

    Deliberately the SAME plane-constant formulation and op order as
    `_occl_tile_kernel`'s block_body (not mt_intersect's cross-product
    form), so results merged with the kernel's equal what the kernel
    would have produced had these triangles stayed in the table.
    """
    v0, v1, v2 = ov_buf.v0, ov_buf.v1, ov_buf.v2
    e1 = v1 - v0
    e2 = v2 - v0
    nrm = jnp.cross(e1, e2)
    nrm = jnp.where(ov_buf.valid[:, None], nrm, 0.0)
    nn = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
    w_u = jnp.cross(e2, nrm) / nn
    w_v = jnp.cross(nrm, e1) / nn
    nv0 = jnp.sum(nrm * v0, axis=-1)[None]
    bu = -jnp.sum(w_u * v0, axis=-1)[None]
    bv = -jnp.sum(w_v * v0, axis=-1)[None]

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    nx, ny, nz = nrm[None, :, 0], nrm[None, :, 1], nrm[None, :, 2]
    wux, wuy, wuz = w_u[None, :, 0], w_u[None, :, 1], w_u[None, :, 2]
    wvx, wvy, wvz = w_v[None, :, 0], w_v[None, :, 1], w_v[None, :, 2]
    det = -(dx * nx + dy * ny + dz * nz)
    ok_det = jnp.abs(det) >= eps
    inv = 1.0 / jnp.where(ok_det, det, 1.0)
    t = ((ox * nx + oy * ny + oz * nz) - nv0) * inv
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = wux * px + wuy * py + wuz * pz + bu
    v = wvx * px + wvy * py + wvz * pz + bv
    ok = ok_det & (jnp.minimum(u, v) >= eps) & (u + v <= 1.0) & (t >= eps)
    return t, ok


def _oversized_occl(o, d, t_limit, ov_buf: TriangleBuffer, eps):
    """One-pass XLA any-hit over the excluded set: [R] bool."""
    t, ok = _oversized_hits(o, d, ov_buf, eps)
    return jnp.any(ok & (t < t_limit[:, None]), axis=1)


def tri_constants_sub(tris: TriangleBuffer, exclude_oversized: bool = False):
    """Cluster-sort and pack constants at SUB granularity.

    Returns (tc [NSUB, 16, 128], sub_aabbs [8, NSUB], perm [N],
    ov_buf, ov_orig). With exclude_oversized the packed table rejects the
    (up to OVER_CAP) oversized triangles — the occlusion path then ORs in
    `_oversized_occl(ov_buf)`; the search path keeps them in-table.
    """
    n = tris.capacity
    pad = (-n) % SUB
    sorted_tris, perm, exclude, ov_buf, ov_orig = _clustered_tables(tris)
    if pad:
        filler = TriangleBuffer.empty(pad)
        sorted_tris = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), sorted_tris, filler
        )
        perm = jnp.concatenate([perm, jnp.full((pad,), NO_HIT, jnp.int32)])
        exclude = jnp.concatenate([exclude, jnp.zeros((pad,), bool)])
    tc, aabbs, perm = _pack_sub(
        sorted_tris, perm, exclude if exclude_oversized else None)
    return tc, aabbs, perm, ov_buf, ov_orig


def _pack_sub(sorted_tris: TriangleBuffer, perm: jax.Array, exclude=None):
    npad = sorted_tris.capacity
    keep = sorted_tris.valid
    if exclude is not None:
        keep = keep & ~exclude
    e1 = sorted_tris.v1 - sorted_tris.v0
    e2 = sorted_tris.v2 - sorted_tris.v0
    nrm = jnp.cross(e1, e2)
    # Invalid/excluded triangles: zero normal -> det == 0 -> rejected free.
    nrm = jnp.where(keep[:, None], nrm, 0.0)
    nn = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
    w_u = jnp.cross(e2, nrm) / nn
    w_v = jnp.cross(nrm, e1) / nn
    rows = [
        nrm[:, 0], nrm[:, 1], nrm[:, 2],
        jnp.sum(nrm * sorted_tris.v0, axis=-1),
        w_u[:, 0], w_u[:, 1], w_u[:, 2],
        -jnp.sum(w_u * sorted_tris.v0, axis=-1),
        w_v[:, 0], w_v[:, 1], w_v[:, 2],
        -jnp.sum(w_v * sorted_tris.v0, axis=-1),
        keep.astype(jnp.float32),
    ]
    table = jnp.stack(rows, axis=0)  # [12, npad]
    table = jnp.concatenate(
        [table, jnp.zeros((16 - table.shape[0], npad), jnp.float32)], axis=0
    )
    nsub = npad // SUB
    tc = table.reshape(16, nsub, SUB).transpose(1, 0, 2)  # [NSUB, 16, 128]

    v = jnp.stack([sorted_tris.v0, sorted_tris.v1, sorted_tris.v2], axis=1)
    big = jnp.float32(1e30)
    bmin = jnp.where(keep[:, None], jnp.min(v, axis=1), big)
    bmax = jnp.where(keep[:, None], jnp.max(v, axis=1), -big)
    blk_min = jnp.min(bmin.reshape(nsub, SUB, 3), axis=1)
    blk_max = jnp.max(bmax.reshape(nsub, SUB, 3), axis=1)
    aabbs = jnp.concatenate(
        [blk_min.T, blk_max.T, jnp.zeros((2, nsub), jnp.float32)], axis=0
    )  # [8, NSUB]
    return tc, aabbs, perm


def _build_ray_tiles(rays_ref, g, comps, sub_iota):
    """(8, 128) register per component: sublane s = ray s of bundle g."""
    out = []
    for c in comps:
        acc = jnp.zeros((8, 128), jnp.float32)
        for s in range(COHERENT):
            scal = rays_ref[0, 0, (g * COHERENT + s) * 8 + c]
            acc = jnp.where(sub_iota == s, scal, acc)
        out.append(acc)
    return out


def _tile_kernel(eps_ref, rays_ref, ids_ref, cnt_ref, tc_ref, t_ref, idx_ref):
    eps = eps_ref[0]
    big = jnp.float32(BIG)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    num_groups = rays_ref.shape[2] // (8 * COHERENT)
    nsub_max = ids_ref.shape[2] // num_groups

    def group_body(g):
        ox, oy, oz, dx, dy, dz = _build_ray_tiles(rays_ref, g, range(6),
                                                  sub_iota)

        # Epilogue trims (shared with rt_mxu._mxu_kernel, see the budget
        # note there): no div-by-0 guard select (det == 0 fails ok_det and
        # a NaN t compares false everywhere), ok folded into the carry
        # compare instead of a where(ok, t, big), and the carry holds the
        # winning BLOCK id per lane — the triangle index is rebuilt once
        # per bundle after the loop.
        def block_body(k, carry):
            bt, bb = carry
            jb = ids_ref[0, 0, g * nsub_max + k]
            nx = tc_ref[jb, 0:1, :]
            ny = tc_ref[jb, 1:2, :]
            nz = tc_ref[jb, 2:3, :]
            nv0 = tc_ref[jb, 3:4, :]
            wux = tc_ref[jb, 4:5, :]
            wuy = tc_ref[jb, 5:6, :]
            wuz = tc_ref[jb, 6:7, :]
            bu = tc_ref[jb, 7:8, :]
            wvx = tc_ref[jb, 8:9, :]
            wvy = tc_ref[jb, 9:10, :]
            wvz = tc_ref[jb, 10:11, :]
            bv = tc_ref[jb, 11:12, :]
            det = -(dx * nx + dy * ny + dz * nz)
            ok_det = jnp.abs(det) >= eps
            inv = 1.0 / det
            t = ((ox * nx + oy * ny + oz * nz) - nv0) * inv
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            u = wux * px + wuy * py + wuz * pz + bu
            v = wvx * px + wvy * py + wvz * pz + bv
            ok = (
                ok_det
                & (jnp.minimum(u, v) >= eps)
                & (u + v <= 1.0)
                & (t >= eps)
            )
            # Strict <: the earlier (lower Morton-sorted) sub-block wins
            # ties, preserving the first-wins rule across the carry.
            better = ok & (t < bt)
            return (jnp.where(better, t, bt), jnp.where(better, jb, bb))

        init = (jnp.full((8, 128), big, jnp.float32),
                jnp.full((8, 128), NO_HIT, jnp.int32))
        bt, bb = jax.lax.fori_loop(0, cnt_ref[0, 0, g], block_body, init)

        # ONE cross-lane fold per bundle finishes all 8 rays: lowest index
        # among equal-t lanes = first in sorted order.
        bi = jnp.where(bb >= 0, bb * SUB + lane_iota, _INT_BIG)
        tmin = jnp.min(bt, axis=1, keepdims=True)               # (8, 1)
        cand = jnp.where(bt == tmin, bi, _INT_BIG)
        imin = jnp.min(cand, axis=1, keepdims=True)
        imin = jnp.where(tmin < big, imin, NO_HIT)
        t_ref[0, :, g:g + 1] = tmin
        idx_ref[0, :, g:g + 1] = imin

    # Python-unrolled: g indexes VMEM output lanes, which must be static.
    for g in range(num_groups):
        group_body(g)


# Any-hit early exit (MEASURED NEGATIVE at every setting — default OFF,
# kept for the record): with nearest-first ("entry"-ordered) block
# lists, a bundle could stop sweeping once every ray is occluded. Value
# = the exit check period E in blocks (0 = off): a lax.while_loop whose
# body runs E blocks in an inner fori_loop, ONE (8,128)->scalar
# all-occluded reduction per E blocks. probe_occl_exit r4, answer-
# identical everywhere: E=1 cfg5 occl 319 -> 909 ms / flagship 119 ->
# 409; chunked E=8 still 492/221, E=16 468/222 — the while_loop
# structure itself (not the cond frequency) defeats Mosaic's dynamic-
# trip fori pipelining. Together with round 2's closest-hit early-out
# negative: on this hardware, data-dependent loop exits cannot beat a
# pipelined fixed-structure sweep even at ~3x the tested pairs.
OCCL_EARLY_EXIT = 0


def _occl_tile_kernel(early_exit, eps_ref, rays_ref, ids_ref, cnt_ref,
                      tc_ref, occ_ref):
    """Any-hit variant: int32 OR-fold, t < t_limit window, no index carry."""
    eps = eps_ref[0]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    num_groups = rays_ref.shape[2] // (8 * COHERENT)
    nsub_max = ids_ref.shape[2] // num_groups

    def group_body(g):
        ox, oy, oz, dx, dy, dz, tlim = _build_ray_tiles(
            rays_ref, g, range(7), sub_iota)

        def block_body(k, occ):
            jb = ids_ref[0, 0, g * nsub_max + k]
            nx = tc_ref[jb, 0:1, :]
            ny = tc_ref[jb, 1:2, :]
            nz = tc_ref[jb, 2:3, :]
            nv0 = tc_ref[jb, 3:4, :]
            wux = tc_ref[jb, 4:5, :]
            wuy = tc_ref[jb, 5:6, :]
            wuz = tc_ref[jb, 6:7, :]
            bu = tc_ref[jb, 7:8, :]
            wvx = tc_ref[jb, 8:9, :]
            wvy = tc_ref[jb, 9:10, :]
            wvz = tc_ref[jb, 10:11, :]
            bv = tc_ref[jb, 11:12, :]
            det = -(dx * nx + dy * ny + dz * nz)
            ok_det = jnp.abs(det) >= eps
            inv = 1.0 / det
            t = ((ox * nx + oy * ny + oz * nz) - nv0) * inv
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            u = wux * px + wuy * py + wuz * pz + bu
            v = wvx * px + wvy * py + wvz * pz + bv
            ok = (
                ok_det
                & (jnp.minimum(u, v) >= eps)
                & (u + v <= 1.0)
                & (t >= eps) & (t < tlim)
            )
            # int32 carry: Mosaic cannot lower vector<i1> fori_loop carries
            # on TPU (infer-vector-layout failure); keep the OR-fold in i32.
            return occ | ok.astype(jnp.int32)

        n = cnt_ref[0, 0, g]
        init = jnp.zeros((8, 128), jnp.int32)
        if early_exit:
            e = int(early_exit)

            def cond(state):
                k, occ = state
                # done when every ray (sublane) has at least one set lane
                all_occluded = jnp.min(jnp.max(occ, axis=1,
                                               keepdims=True)) > 0
                return jnp.logical_and(k < n, jnp.logical_not(all_occluded))

            def body(state):
                k, occ = state
                # E blocks per exit check: the inner fixed/dynamic-trip
                # fori pipelines like the plain loop; only one scalar
                # reduction per E blocks interrupts it.
                occ = jax.lax.fori_loop(k, jnp.minimum(k + e, n),
                                        block_body, occ)
                return k + e, occ

            _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        else:
            occ = jax.lax.fori_loop(0, n, block_body, init)
        occ_ref[0, :, g:g + 1] = jnp.max(occ, axis=1, keepdims=True)

    for g in range(num_groups):
        group_body(g)


# The cull pre-pass materializes [rays, NSUB] slab-test intermediates in
# HBM; at 128-triangle granularity NSUB is 8x the bundle kernel's block
# count and 2M rays x 784 sub-blocks = 6.9 GB per temp — an HBM OOM at
# compile time. Cap the per-chunk element count (~768 MB of f32 temps)
# and stream the pre-pass with lax.map beyond it; the compacted lists
# land in one flat [bundles, NSUB] buffer either way.
_PREPASS_ELEMS = 192 * 1024 * 1024

# Coarse-cull fallback: above _CULL_COLS sub-blocks the pre-pass culls at
# merged-sub-block granularity (adjacent Morton sub-blocks union in powers
# of two until <= _CULL_COLS columns) and the compacted list expands x
# group host-side; the kernel sweeps 128-triangle sub-blocks either way.
# MEASURED NEGATIVE at the BASELINE 4K x 100k config: 98-column coarse
# lists made the forward 4.88 s vs 2.91 s with full 784-column fine lists
# — fine culling saves far more kernel sweep time than the wider
# per-bundle argsort costs — so the default (1024 = the per-segment
# maximum, since TILE_TRI_LIMIT/SUB = 1024) never coarsens. Kept, tested
# (tests/test_rt_tile.py), and tunable for future shapes.
_CULL_COLS = 1024


# Pre-pass mode (A/B override; None = auto = "argsort"). Modes:
#   "argsort": exact per-ray slab mask + 8-ray OR-fold + stable argsort
#       compaction — the production path.
#   "interval": ONE conservative interval slab test per bundle + sort-free
#       K-extraction. MEASURED NEGATIVE end-to-end (round 4, kept for the
#       record + future shapes): winner-identical and 2.8x cheaper per
#       pre-pass on top-of-frame bundles (4K x 100k primary sweep 256 ->
#       226 ms), but per-bundle list lengths are heavy-tailed — bundles
#       near the ground-plane horizon legitimately cross O(100) Morton
#       blocks (the early cnt stats of p99=3 sampled only sky rows), the
#       K=32 extraction overflows to its sweep-everything fallback there,
#       and one grazing frame slice measured 655 -> 2164 ms: full-frame
#       4.32 s vs argsort's 2.73 s (scripts/probe_cfg5_isolate.py). The
#       hull is also origin-interval-based, so shadow/bounce wavefronts
#       (scattered origins) explode it outright (95 -> 444 ms any-hit).
#   "exact": per-ray mask + K-extraction — same overflow tail, same loss.
# Net: a sort network is exactly the right tool for heavy-tailed list
# compaction; the cheap alternatives lose where the lists matter most.
CULL_MODE = None


# Two-level ("hier") pre-pass knobs: sub-blocks are grouped into
# superblocks of HIER_GROUP adjacent (Morton-ordered) sub-blocks; the
# per-ray slab test runs on the NSUB/HIER_GROUP superblock boxes first,
# then exactly on the HIER_K kept superblocks' sub-boxes (gathered per
# bundle). Bundles keeping more than HIER_K superblocks fall back to the
# dense iota list (sweep every block — conservative-correct).
# MEASURED NEGATIVE on-chip (round 5, scripts/probe_hier.py with
# nudge+readback timing): on the BASELINE config-5 scene (100k tris,
# nsub=784) the quarter-frame legs are argsort 584/410/719 ms
# (search/occl/e2e) vs hier 3690/3505/7431 ms — ~6x SLOWER. The
# superblock gather + per-bundle fine re-test costs far more than the
# dense-mask width it saves at this scale, so auto stays "argsort"
# everywhere; "hier" remains an explicit CULL_MODE override for probes
# and possible much-wider tables. (Getting this number also flushed out
# two real on-chip bugs in the hier path, both fixed and regression-
# guarded: a [B,8,256,3]-layout padding OOM and a bool-gather
# miscompile inside lax.map — see _hier_cull_lists.)
HIER_GROUP = 8
HIER_K = 32
HIER_MIN_NSUB = 256


def _resolve_cull_mode(coherent: bool, nsub: int = 0) -> str:
    if CULL_MODE is not None:
        return CULL_MODE
    return "argsort"


def _hier_cull_lists(o, d, t_limit, aabbs):
    """Exact two-level per-bundle lists: identical (prefix, cnt) to the
    flat argsort mode except (a) overflow bundles (> HIER_K superblocks
    kept), which get the dense iota list (sweep everything — same
    winners, the kernel re-tests every triangle; ascending visit order
    preserved, so the first-wins tie rule holds), and (b) ALL fully
    empty (inverted-sentinel) sub-blocks: the flat slab test KEEPS
    inverted boxes, the hierarchy masks them explicitly at BOTH levels —
    empty superblocks never consume HIER_K budget or trigger the
    overflow fallback (padding-heavy sliced-scene tails produce many),
    and empty fine columns never enter the kept prefix regardless of
    which sids slot they landed in. They contain no valid triangles, so
    sweeping them was a no-op; winners are unaffected.

    Exactness argument: a sub-box is contained in its superblock box, so
    a ray strictly missing the superblock (slab reject, behind-origin
    reject, or t-ceiling reject — the coarse entry t is a lower bound on
    the fine entry t) misses every sub-box too; NaN lanes (origin exactly
    on a slab plane x zero direction) fall through comparisons to "keep"
    at BOTH levels, so the conservative direction is preserved.
    """
    nsub = aabbs.shape[1]
    g = HIER_GROUP
    pad = (-nsub) % g
    if pad:
        big = jnp.float32(1e30)
        filler = jnp.concatenate([
            jnp.full((3, pad), big), jnp.full((3, pad), -big),
            jnp.zeros((2, pad), jnp.float32)])
        aabbs_p = jnp.concatenate([aabbs, filler], axis=1)
    else:
        aabbs_p = aabbs
    ns = (nsub + pad) // g
    k = min(HIER_K, ns)
    # Superblock union boxes [8, ns]; inverted empty sentinels stay
    # inverted (min of +big mins / max of -big maxes).
    smin = jnp.min(aabbs_p[0:3].reshape(3, ns, g), axis=2)
    smax = jnp.max(aabbs_p[3:6].reshape(3, ns, g), axis=2)
    saabbs = jnp.concatenate([smin, smax, jnp.zeros((2, ns), jnp.float32)])

    # Coarse: exact per-ray slab test at superblock granularity + OR-fold.
    # All-empty superblocks (inverted union box: every member sub-block
    # is a padding sentinel) always pass the slab test; mask them so they
    # neither consume HIER_K budget nor force the overflow fallback.
    sempty = jnp.any(smin > smax, axis=0)               # [ns]
    cm = block_cull_mask(o, d, saabbs, t_limit)
    gs = jnp.any(cm.reshape(-1, COHERENT, ns), axis=1) & ~sempty[None]
    cnt_s = jnp.sum(gs, axis=1).astype(jnp.int32)
    sids = jnp.argsort(~gs, axis=1, stable=True)[:, :k].astype(jnp.int32)
    over = cnt_s > k

    # Fine: exact per-ray slab test on each bundle's gathered sub-boxes.
    # sids' kept prefix is ascending and sub-ids within a superblock are
    # ascending, so kept fine columns are globally ascending; padding
    # columns (culled superblocks) can only fail the fine test.
    sub_ids = (sids[:, :, None] * g
               + jnp.arange(g, dtype=jnp.int32)[None, None, :]
               ).reshape(-1, k * g)                      # [B, k*g]
    nb = sub_ids.shape[0]
    # Per-axis accumulation keeps every intermediate at [B, 8, k*g]
    # (minor dim k*g = lane-aligned) or [B, k*g]. The vectorized
    # [B, 8, k*g, 3] form OOMed on-chip: XLA pads the minor dim 3 to
    # the 128-lane register width, a 42x expansion that blew a 532 MB
    # unpadded working set to a 24 GB padded HLO-temp demand at 524k
    # rays (measured round 5) — the fault behind the round-4 default.
    ob = o.reshape(nb, COHERENT, 3)
    invd = 1.0 / d.reshape(nb, COHERENT, 3)
    tn = jnp.full((nb, COHERENT, k * g), -jnp.inf, jnp.float32)
    tf = jnp.full((nb, COHERENT, k * g), jnp.inf, jnp.float32)
    femp = jnp.zeros((nb, k * g), bool)
    fmin_all = aabbs_p[0:3]
    fmax_all = aabbs_p[3:6]
    for a in range(3):
        fmin_a = fmin_all[a][sub_ids]                    # [B, k*g]
        fmax_a = fmax_all[a][sub_ids]
        # Fully-empty sub-blocks (inverted sentinels) accumulate here,
        # from the SAME f32 gathers the slab test uses. Do NOT replace
        # this with a gather of a precomputed bool column mask
        # (empty_col[sub_ids]): that bool gather miscompiled on XLA:TPU
        # when the aabbs producer was constant-folded in-graph and the
        # pre-pass ran inside a lax.map chunk — it returned all-True and
        # zeroed every cull list (round 5, scripts/probe_hier_min.py;
        # same i1-lowering bug family as the round-3 Mosaic carry).
        femp = femp | (fmin_a > fmax_a)
        oa = ob[:, :, a][:, :, None]                     # [B, 8, 1]
        ia = invd[:, :, a][:, :, None]
        t0a = (fmin_a[:, None, :] - oa) * ia             # [B, 8, k*g]
        t1a = (fmax_a[:, None, :] - oa) * ia
        tn = jnp.maximum(tn, jnp.minimum(t0a, t1a))
        tf = jnp.minimum(tf, jnp.maximum(t0a, t1a))
    reject = (tn > tf) | (tf < 0.0)
    if t_limit is not None:
        reject |= tn > t_limit.reshape(nb, COHERENT)[:, :, None]
    fm = jnp.any(~reject, axis=1)                        # [B, k*g]
    # The slab test KEEPS inverted boxes (near=-huge, far=+huge), so the
    # nsub-padding filler sub-blocks must be masked out explicitly or
    # their out-of-range ids would enter the kept prefix — and real but
    # fully-empty sub-blocks (inverted sentinels from scene padding)
    # must be masked symmetrically, else only the ones that happened to
    # land in a kept bundle's sids slots would survive.
    fm = fm & (sub_ids < nsub) & ~femp
    cnt = jnp.sum(fm, axis=1).astype(jnp.int32)
    order = jnp.argsort(~fm, axis=1, stable=True)
    ids_k = jnp.take_along_axis(sub_ids, order, axis=1)  # kept prefix asc

    # Widen to the kernel's [B, nsub] list buffer (tail never read) and
    # apply the overflow fallback.
    iota = jnp.arange(nsub, dtype=jnp.int32)
    if nsub > k * g:
        tail = jnp.broadcast_to(iota[None, k * g:], (nb, nsub - k * g))
        ids = jnp.concatenate([ids_k, tail], axis=1)
    else:
        ids = ids_k[:, :nsub]
    ids = jnp.where(over[:, None], iota[None, :], ids)
    cnt = jnp.where(over, jnp.int32(nsub), cnt)
    return ids, cnt


def _cull_lists(o, d, t_limit, aabbs, cull_mode):
    """Per-bundle compacted ascending sub-block lists for one ray chunk."""
    nsub = aabbs.shape[1]
    if cull_mode == "hier":
        return _hier_cull_lists(o, d, t_limit, aabbs)
    if cull_mode == "interval":
        gmask = group_cull_mask(o, d, aabbs, t_limit, group=COHERENT)
        return extract_lists(gmask)
    if cull_mode == "entry":
        # Nearest-first lists for the any-hit kernel's early exit: sort
        # keys are the bundle-min slab entry t (+inf for culled blocks),
        # so occluders closest to the shadow-ray origins are tested
        # first. Order never changes the OR-fold result.
        mask, tn = block_cull_mask(o, d, aabbs, t_limit, return_entry=True)
        # A kept block with NaN entry (origin exactly on a slab plane,
        # see block_cull_mask's NaN note) must NOT sort after the +inf
        # culled blocks — that would push it beyond the swept cnt-prefix
        # and drop a real occluder. NaN keys become -inf (tested first).
        tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
        # Clamp kept keys finite: a kept block whose entry overflowed to
        # +inf would otherwise interleave with the +inf culled keys and
        # could likewise leave the cnt-prefix.
        tn = jnp.minimum(tn, jnp.float32(3.0e38))
        keyed = jnp.where(mask, tn, jnp.inf).reshape(-1, COHERENT, nsub)
        gkey = jnp.min(keyed, axis=1)
        gmask = jnp.any(mask.reshape(-1, COHERENT, nsub), axis=1)
        ids = jnp.argsort(gkey, axis=1, stable=True).astype(jnp.int32)
        cnt = jnp.sum(gmask, axis=1).astype(jnp.int32)
        return ids, cnt
    mask = block_cull_mask(o, d, aabbs, t_limit)
    gmask = jnp.any(mask.reshape(-1, COHERENT, nsub), axis=1)
    if cull_mode == "exact":
        return extract_lists(gmask)
    ids = jnp.argsort(~gmask, axis=1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(gmask, axis=1).astype(jnp.int32)
    return ids, cnt


def _prep(o, d, aabbs, t_limit, cull_mode="exact"):
    """Pad rays, cull, and compact ascending per-bundle sub-block lists.

    `cull_mode` must reach here as a jit-static value: it is read at
    trace time, so a runtime flag flip would otherwise silently reuse
    the previously compiled mode (the round-4 A/B initially measured two
    identical legs because of exactly that).
    """
    r = o.shape[0]
    pad = (-r) % RAY_GROUP
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        if t_limit is not None:
            t_limit = jnp.concatenate(
                [t_limit, jnp.full((pad,), -1.0, t_limit.dtype)]
            )
    rp = r + pad
    nsub = aabbs.shape[1]

    group = 1
    while nsub // group > _CULL_COLS and nsub % (group * 2) == 0:
        group *= 2
    nc = nsub // group
    if group > 1:
        # Coarse cull AABBs: union of each run of `group` adjacent
        # (Morton-ordered, so spatially coherent) sub-block boxes.
        # Inverted empty-box sentinels (+big/-big) stay inverted.
        cmin = jnp.min(aabbs[0:3].reshape(3, nc, group), axis=2)
        cmax = jnp.max(aabbs[3:6].reshape(3, nc, group), axis=2)
        aabbs = jnp.concatenate(
            [cmin, cmax, jnp.zeros((2, nc), jnp.float32)], axis=0
        )

    # Interval mode's slab temps live at bundle granularity — COHERENTx
    # fewer elements per ray — so the streaming cutoff scales with it.
    row_scale = COHERENT if cull_mode == "interval" else 1
    if rp * nc <= _PREPASS_ELEMS * row_scale:
        ids, cnt = _cull_lists(o, d, t_limit, aabbs, cull_mode)
    else:
        chunk = max(RAY_GROUP, (_PREPASS_ELEMS * row_scale // nc)
                    // RAY_GROUP * RAY_GROUP)
        cpad = (-rp) % chunk
        oc, dc, tlc = o, d, t_limit
        if cpad:
            oc = jnp.concatenate([oc, jnp.zeros((cpad, 3), o.dtype)])
            dc = jnp.concatenate(
                [dc, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype),
                              (cpad, 1))]
            )
            if t_limit is not None:
                tlc = jnp.concatenate(
                    [tlc, jnp.full((cpad,), -1.0, t_limit.dtype)]
                )
        nch = (rp + cpad) // chunk
        if t_limit is None:
            ids, cnt = jax.lax.map(
                lambda a: _cull_lists(a[0], a[1], None, aabbs, cull_mode),
                (oc.reshape(nch, chunk, 3), dc.reshape(nch, chunk, 3)),
            )
        else:
            ids, cnt = jax.lax.map(
                lambda a: _cull_lists(a[0], a[1], a[2], aabbs, cull_mode),
                (oc.reshape(nch, chunk, 3), dc.reshape(nch, chunk, 3),
                 tlc.reshape(nch, chunk)),
            )
        ids = ids.reshape(-1, nc)[: rp // COHERENT]
        cnt = cnt.reshape(-1)[: rp // COHERENT]
        # Miscompile guard (round 5): without this barrier, the scan-
        # stacked lists fed straight into the pallas_call made the
        # XLA:TPU program return all-miss for every ray (hier mode,
        # >262k rays — exactly the streaming sizes), while returning
        # the same ids/cnt as jit outputs was exact. Pinning the scan
        # results before the reshape/kernel restores exactness
        # (scripts/probe_hier_min.py).
        ids, cnt = jax.lax.optimization_barrier((ids, cnt))

    if group > 1:
        # Expand each coarse id into its `group` ascending sub-block ids;
        # compacted-prefix order (and so the first-wins tie rule) holds.
        ids = (ids[:, :, None] * group
               + jnp.arange(group, dtype=jnp.int32)[None, None, :]
               ).reshape(-1, nsub)
        cnt = cnt * group

    groups_per_step = RAY_GROUP // COHERENT
    comps = [o, d] if t_limit is None else [o, d, t_limit[:, None]]
    width = 8
    have = sum(c.shape[1] for c in comps)
    comps.append(jnp.zeros((rp, width - have), o.dtype))
    rays = jnp.concatenate(comps, axis=1)
    rays = rays.reshape(rp // RAY_GROUP, 1, RAY_GROUP * 8)
    ids = ids.reshape(rp // RAY_GROUP, 1, groups_per_step * nsub)
    cnt = cnt.reshape(rp // RAY_GROUP, 1, groups_per_step)
    return rays, ids, cnt, rp, nsub, groups_per_step


@trace_aware(static_argnames=("interpret", "cull_mode"))
def _tile_search(o, d, tc, aabbs, eps, t_limit=None,
                 interpret: bool = False, cull_mode: str = "exact"):
    """Search entry. MUST stay inline (no nested jit) inside an outer
    jit: with the scene constants (tc/aabbs) computed in the same outer
    trace, a pjit call boundary around this search made the XLA:TPU
    program return all-miss (t=BIG, idx=-1 for every ray) for the "hier"
    pre-pass — measured round 5, scripts/probe_hier_min.py — while the
    inlined graph and the eager-constants call were both exact. See
    utils/tracejit.py."""
    r = o.shape[0]
    rays, ids, cnt, rp, nsub, groups = _prep(o, d, aabbs, t_limit, cull_mode)
    grid = rp // RAY_GROUP
    out = pl.pallas_call(
        _tile_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1, RAY_GROUP * 8), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, groups * nsub), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, groups), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(tc.shape, lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, COHERENT, groups), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, COHERENT, groups), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid, COHERENT, groups), jnp.float32),
            jax.ShapeDtypeStruct((grid, COHERENT, groups), jnp.int32),
        ],
        interpret=interpret,
    )(eps, rays, ids, cnt, tc)
    # Element [step, s, g] = ray step*RAY_GROUP + g*COHERENT + s.
    best_t = out[0].transpose(0, 2, 1).reshape(-1)[:r]
    best_i = out[1].transpose(0, 2, 1).reshape(-1)[:r]
    return best_t, best_i


@trace_aware(static_argnames=("interpret", "cull_mode", "early_exit"))
def _tile_occl(o, d, t_limit, tc, aabbs, eps, interpret: bool = False,
               cull_mode: str = "argsort", early_exit: bool = False):
    """Occlusion entry — same inline-under-trace rule as _tile_search
    (the nested-jit pjit boundary miscompiled the hier pre-pass on TPU)."""
    r = o.shape[0]
    rays, ids, cnt, rp, nsub, groups = _prep(o, d, aabbs, t_limit, cull_mode)
    grid = rp // RAY_GROUP
    out = pl.pallas_call(
        partial(_occl_tile_kernel, early_exit),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1, RAY_GROUP * 8), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, groups * nsub), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, groups), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(tc.shape, lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, COHERENT, groups), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid, COHERENT, groups), jnp.int32),
        ],
        interpret=interpret,
    )(eps, rays, ids, cnt, tc)
    return out[0].transpose(0, 2, 1).reshape(-1)[:r] > 0


def _sliced(tris: TriangleBuffer, exclude_oversized: bool = False):
    """Cluster-sort + slice into resident segments; yields packed tables.

    Returns (segments, ov_buf, ov_orig); with exclude_oversized the
    caller ORs in `_oversized_occl(ov_buf)` once, outside the loop.
    """
    sorted_tris, perm, exclude, ov_buf, ov_orig = _clustered_tables(tris)
    seg = TILE_TRI_LIMIT
    nseg = -(-tris.capacity // seg)
    pad = nseg * seg - tris.capacity
    if pad:
        filler = TriangleBuffer.empty(pad)
        sorted_tris = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), sorted_tris, filler
        )
        perm = jnp.concatenate([perm, jnp.full((pad,), NO_HIT, jnp.int32)])
        exclude = jnp.concatenate([exclude, jnp.zeros((pad,), bool)])

    def segments():
        for k in range(nseg):
            sl = jax.tree.map(lambda a: a[k * seg:(k + 1) * seg], sorted_tris)
            perm_k = perm[k * seg:(k + 1) * seg]
            tc, aabbs, _ = _pack_sub(
                sl, perm_k,
                exclude[k * seg:(k + 1) * seg] if exclude_oversized else None)
            yield tc, aabbs, perm_k

    return segments(), ov_buf, ov_orig


def tile_tri_search(o: jax.Array, d: jax.Array, tris: TriangleBuffer, eps,
                    t_limit: jax.Array = None, coherent: bool = False):
    """tri_search hook (core/intersect.py contract): (best_t, orig idx).

    `coherent` marks a shared-origin wavefront (camera rays): the cull
    pre-pass then uses the cheap interval slab test (see CULL_MODE).
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
    if tris.capacity <= TILE_TRI_LIMIT:
        tc, aabbs, perm, ov_buf, _ = tri_constants_sub(tris)
        if PRIMARY_PREHIT:
            hint = _oversized_min_t(o, d, ov_buf, eps_arr)
            t_limit = hint if t_limit is None else jnp.minimum(t_limit, hint)
        cull_mode = _resolve_cull_mode(coherent, aabbs.shape[1])
        best_t, sorted_idx = _tile_search(o, d, tc, aabbs, eps_arr, t_limit,
                                          interpret, cull_mode)
        orig = jnp.take(perm, jnp.maximum(sorted_idx, 0))
        return best_t, jnp.where(sorted_idx >= 0, orig, NO_HIT)

    r = o.shape[0]
    best_t = jnp.full((r,), BIG, jnp.float32)
    best_i = jnp.full((r,), NO_HIT, jnp.int32)
    segments, ov_buf, _ = _sliced(tris)
    if PRIMARY_PREHIT:
        hint = _oversized_min_t(o, d, ov_buf, eps_arr)
        t_limit = hint if t_limit is None else jnp.minimum(t_limit, hint)
    for tc, aabbs, perm_k in segments:
        t_k, idx_k = _tile_search(o, d, tc, aabbs, eps_arr, t_limit,
                                  interpret,
                                  _resolve_cull_mode(coherent,
                                                     aabbs.shape[1]))
        orig_k = jnp.take(perm_k, jnp.maximum(idx_k, 0))
        orig_k = jnp.where(idx_k >= 0, orig_k, NO_HIT)
        better = t_k < best_t  # earlier segment wins ties (first-wins)
        best_t = jnp.where(better, t_k, best_t)
        best_i = jnp.where(better, orig_k, best_i)
    return best_t, best_i


def tile_occlusion(o: jax.Array, d: jax.Array, t_limit: jax.Array,
                   tris: TriangleBuffer, eps) -> jax.Array:
    """Occlusion [R] bool: any accepted hit in (eps, t_limit).

    Shadow origins are per-pixel hit points (never coherent), so the
    pre-pass always uses the exact per-ray mask.
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    early = OCCL_EARLY_EXIT

    def occl_mode(nsub):
        # Early exit wants nearest-first lists; without it the size-gated
        # ascending-id resolution applies (CULL_MODE override still wins
        # for A/B probes).
        if CULL_MODE is not None:
            return CULL_MODE
        return "entry" if early else _resolve_cull_mode(False, nsub)

    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
    if tris.capacity <= TILE_TRI_LIMIT:
        tc, aabbs, _, ov_buf, _ = tri_constants_sub(
            tris, exclude_oversized=True)
        occluded = _tile_occl(o, d, t_limit, tc, aabbs, eps_arr, interpret,
                              occl_mode(aabbs.shape[1]), early)
    else:
        occluded = jnp.zeros((o.shape[0],), bool)
        segments, ov_buf, _ = _sliced(tris, exclude_oversized=True)
        for tc, aabbs, _ in segments:
            occluded |= _tile_occl(o, d, t_limit, tc, aabbs, eps_arr,
                                   interpret, occl_mode(aabbs.shape[1]),
                                   early)
    return occluded | _oversized_occl(o, d, t_limit, ov_buf, eps_arr)


tile_tri_search.occlusion = tile_occlusion
tile_tri_search.supports_coherent = True

"""MXU tile kernel: the ray-triangle test as a systolic-array matmul.

The VPU tile kernel (rt_tile.py) spends ~96 cycles per (8 rays x 128
tris) block — it is at the vector ISSUE limit (ROOFLINE.md), so the only
way below it is to move the arithmetic off the VPU. Möller-Trumbore's
four quantities are trilinear forms in (o, d, triangle):

    [det, t*det, u*det, v*det] = ray_features[16] @ tri_features[16, 4]

(core/intersect.py:142-189, the same formulation the XLA "mxu" backend
uses) — a K=16 contraction the MXU executes directly. This kernel runs
it per (128 rays x 128 triangles) block as a [128, 16] @ [16, 512]
matmul and keeps the closest-hit reduction in VMEM, so the [R, 4N]
intermediate that makes the XLA mxu backend HBM-bound never exists.
Per block the VPU epilogue (acceptance window + running min) touches
each quantity once — ~4x fewer vector ops per pair than the VPU tile
kernel, with the 16-deep MAC on the MXU.

Culling reuses the rt_tile machinery at 128-triangle granularity, with
one compacted ascending block list per 128-RAY group (the matmul's M
dimension): coarser than the tile kernel's 8-ray bundles, so each group
sweeps the union of its rays' blocks. Oversized-triangle handling is
shared with rt_tile (segregated for the primary search, excluded +
XLA-swept for occlusion).

Precision: the matmul runs at HIGHEST (bf16x6, f32-faithful — see the
precision note at core/intersect.py:hits_from_features). The search is
stop_gradient'd and closest_hit recomputes the winner's t/u/v exactly
in f32, so last-ulp t differences vs the plane-constant kernels can
only flip winners on exact near-ties (the documented eps-window class
of divergence; renders agree to <0.01%).

Reference anchors: Möller-Trumbore window src/scene/ray_triangle.h:23-47;
SPMD triangle loop src/ispc/trace.ispc:70-84; the culling role of the
reference BVH src/main.cpp:98-171.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esctp1raytracer_tpu.core.intersect import (
    BIG, NO_HIT, ray_features, tri_features,
)
from esctp1raytracer_tpu.utils.tracejit import trace_aware
from esctp1raytracer_tpu.kernels.cull import (
    block_cull_mask,
    extract_lists,
    group_cull_mask,
)
from esctp1raytracer_tpu.kernels.rt_tile import (
    _clustered_tables, _oversized_min_t, _oversized_occl,
)
from esctp1raytracer_tpu.scene.types import TriangleBuffer

# Rays per grid step = the matmul M dimension. Also the cull-list
# granularity: each group sweeps the UNION of its rays' candidate blocks,
# so smaller M means tighter lists (fewer tested pairs) but more groups
# (more per-step overhead + a wider pre-pass). Module-level so probes and
# tests can A/B it (scripts/probe_mxu_m.py measures the sweep on-chip);
# read at trace time by mxu_tile_search/mxu_tile_occlusion.
RAY_TILE = 128
SUB = 128       # triangles per block = 128 columns per quantity
MXU_TRI_LIMIT = 32_768  # 256 blocks x [16, 512] f32 = 8.4 MB VMEM resident

_INT_BIG = np.int32(2**31 - 1)


def _pack_mxu(sorted_tris: TriangleBuffer, exclude=None):
    """Pack feature columns quantity-major: tf [NSUB, 16, 512], aabbs [8, NSUB].

    Column layout per block: [0:128) det | [128:256) t*det | [256:384)
    u*det | [384:512) v*det, so the epilogue slices four contiguous
    (128, 128) tiles from the matmul output.
    """
    npad = sorted_tris.capacity
    keep = sorted_tris.valid
    if exclude is not None:
        keep = keep & ~exclude
    tf = tri_features(sorted_tris.v0, sorted_tris.v1, sorted_tris.v2)
    # Zeroed columns: det = 0 and t*det = 0 -> rejected by ok_det/t>=eps.
    tf = jnp.where(keep[:, None, None], tf, 0.0)  # [N, 16, 4]
    nsub = npad // SUB
    tfq = (tf.reshape(nsub, SUB, 16, 4)
           .transpose(0, 2, 3, 1)      # [NSUB, 16, 4, 128]
           .reshape(nsub, 16, 4 * SUB))

    v = jnp.stack([sorted_tris.v0, sorted_tris.v1, sorted_tris.v2], axis=1)
    big = jnp.float32(1e30)
    bmin = jnp.where(keep[:, None], jnp.min(v, axis=1), big)
    bmax = jnp.where(keep[:, None], jnp.max(v, axis=1), -big)
    blk_min = jnp.min(bmin.reshape(nsub, SUB, 3), axis=1)
    blk_max = jnp.max(bmax.reshape(nsub, SUB, 3), axis=1)
    aabbs = jnp.concatenate(
        [blk_min.T, blk_max.T, jnp.zeros((2, nsub), jnp.float32)], axis=0
    )
    return tfq, aabbs


# Matmul precision: HIGHEST (bf16x6, f32-faithful) everywhere. A
# hand-rolled bf16x3 search (hi/lo splitting, 3 native MXU passes
# instead of HIGHEST's 6 — Mosaic's dot lowering only supports DEFAULT
# and HIGHEST) measured 83.7 ms vs HIGHEST's 100.1 ms on the flagship
# sweep, but its cancellation error in the t/u/v numerators flips
# ~1% of winners (vs 1e-6 at HIGHEST) and the rendered image showed
# 0.37% of pixels off by >0.01 with max|diff| 1.35 — acceptance-window
# misclassification, not the benign near-tie class. The 16% kernel win
# is not worth that; SEARCH_BF16X3 keeps the path testable. The
# occlusion kernel is unconditionally HIGHEST: its boolean t < t_limit
# compare has no downstream recompute to absorb cancellation error (the
# quirk that flipped ~6% of Cornell shadow tests at bf16x3 in the XLA
# mxu backend — core/intersect.py:hits_from_features).
SEARCH_BF16X3 = False

# Pre-pass mode override (None = auto = "argsort"), same semantics and
# round-4 measurements as rt_tile.CULL_MODE: the interval/extraction
# alternatives are a measured end-to-end negative (heavy-tailed list
# lengths overflow the extraction; the m=128 origin hull of a shadow
# wavefront explodes — flagship any-hit 95 -> 444 ms). The override keeps
# them selectable for probes and future shapes.
CULL_MODE = None


def _resolve_cull_mode(coherent: bool, nsub: int = 0) -> str:
    if CULL_MODE is not None:
        return CULL_MODE
    return "argsort"
_OCCL_PRECISION = jax.lax.Precision.HIGHEST


def _split_bf16(x: jax.Array):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x (16 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """bf16x3 matmul: hi*hi + hi*lo + lo*hi, f32 accumulate (drops lo*lo)."""
    dims = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32)
    return (jax.lax.dot_general(a_hi, b_hi, dims, **kw)
            + jax.lax.dot_general(a_hi, b_lo, dims, **kw)
            + jax.lax.dot_general(a_lo, b_hi, dims, **kw))


def _mxu_kernel(bf16x3, eps_ref, ids_ref, cnt_ref, *refs):
    if bf16x3:
        rfh_ref, rfl_ref, tfh_ref, tfl_ref, t_ref, idx_ref = refs
    else:
        rfh_ref, tfh_ref, t_ref, idx_ref = refs
        rfl_ref = tfl_ref = None
    eps = eps_ref[0]
    big = jnp.float32(BIG)
    m = rfh_ref.shape[1]  # rays per group (the matmul M dimension)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (m, SUB), 1)
    rf_hi = rfh_ref[0]  # (m, 16) bf16 (or f32 when not bf16x3)
    rf_lo = rfl_ref[0] if bf16x3 else None

    # Epilogue budget: the sweep is VPU-issue-bound on these elementwise
    # ops (~7 cycles per ray-row per block measured, the HIGHEST matmul
    # hides under them), so every op counts:
    #  - no div-by-0 guard select: det == 0 fails ok_det, and the poisoned
    #    t/u/v (inf/NaN) can then never pass `better` (ok is ANDed in);
    #  - no where(ok, t, big): fold ok into the carry compare instead;
    #  - carry the winning BLOCK id per lane (one scalar-broadcast select)
    #    instead of a materialized index tile; the triangle index is
    #    rebuilt once per group as bb*SUB + lane after the loop.
    def body(k, carry):
        bt, bb = carry
        jb = ids_ref[0, 0, k]
        if bf16x3:
            s = _dot3(rf_hi, rf_lo, tfh_ref[jb], tfl_ref[jb])  # (128, 512)
        else:
            s = jax.lax.dot_general(
                rf_hi, tfh_ref[jb], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        det = s[:, 0:128]
        t_num = s[:, 128:256]
        u_num = s[:, 256:384]
        v_num = s[:, 384:512]
        ok_det = jnp.abs(det) >= eps
        inv = 1.0 / det
        t = t_num * inv
        u = u_num * inv
        v = v_num * inv
        ok = (ok_det & (jnp.minimum(u, v) >= eps) & (u + v <= 1.0)
              & (t >= eps))
        # Strict <: earlier (lower-sorted) block wins ties. NaN t (det==0)
        # compares false, and ok gates it anyway.
        better = ok & (t < bt)
        return jnp.where(better, t, bt), jnp.where(better, jb, bb)

    init = (jnp.full((m, SUB), big, jnp.float32),
            jnp.full((m, SUB), NO_HIT, jnp.int32))
    bt, bb = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, init)

    bi = jnp.where(bb >= 0, bb * SUB + lane_iota, _INT_BIG)
    tmin = jnp.min(bt, axis=1, keepdims=True)           # (m, 1)
    cand = jnp.where(bt == tmin, bi, _INT_BIG)
    imin = jnp.min(cand, axis=1, keepdims=True)
    imin = jnp.where(tmin < big, imin, NO_HIT)
    t_ref[0] = tmin
    idx_ref[0] = imin


def _mxu_occl_kernel(eps_ref, ids_ref, cnt_ref, rf_ref, tl_ref, tf_ref,
                     occ_ref):
    """Any-hit variant: int32 OR-fold, t < t_limit window, no index carry.

    Same epilogue trims as the search kernel (no div guard — det == 0
    fails ok_det and NaN comparisons are false). The OR-fold carry is
    int32, not bool: Mosaic cannot lower vector<i1> fori_loop carries on
    TPU (infer-vector-layout failure on the real chip).
    """
    eps = eps_ref[0]
    rf = rf_ref[0]
    m = rf.shape[0]
    tlim = tl_ref[0]  # (m, 1)

    def body(k, occ):
        jb = ids_ref[0, 0, k]
        s = jax.lax.dot_general(
            rf, tf_ref[jb], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_OCCL_PRECISION,
        )
        det = s[:, 0:128]
        t_num = s[:, 128:256]
        u_num = s[:, 256:384]
        v_num = s[:, 384:512]
        ok_det = jnp.abs(det) >= eps
        inv = 1.0 / det
        t = t_num * inv
        u = u_num * inv
        v = v_num * inv
        ok = (ok_det & (jnp.minimum(u, v) >= eps) & (u + v <= 1.0)
              & (t >= eps) & (t < tlim))
        return occ | ok.astype(jnp.int32)

    occ = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body,
                            jnp.zeros((m, SUB), jnp.int32))
    occ_ref[0] = jnp.max(occ, axis=1, keepdims=True)


def _prep_mxu(o, d, aabbs, t_limit, m=128, cull_mode="exact"):
    """Pad rays to m, cull per m-ray group, build feature rows.

    `cull_mode` must arrive as a jit-static value (see rt_tile._prep)."""
    r = o.shape[0]
    pad = (-r) % m
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
    if cull_mode == "interval":
        # One interval slab test per m-ray group instead of m per-ray
        # tests + OR-fold; sort-free extraction (see rt_tile._cull_lists
        # and probe_prepass.py). Shared-origin wavefronts only: the m-ray
        # origin hull of a shadow wavefront is unboundedly loose.
        gmask = group_cull_mask(o, d, aabbs, t_limit, group=m)
        ids, cnt = extract_lists(gmask)
    else:
        mask = block_cull_mask(o, d, aabbs, t_limit)
        gmask = jnp.any(mask.reshape(rp // m, m, nsub), axis=1)
        if cull_mode == "exact":
            ids, cnt = extract_lists(gmask)
        else:  # "argsort": the round-2/3 path, kept for A/B
            ids = jnp.argsort(~gmask, axis=1, stable=True).astype(jnp.int32)
            cnt = jnp.sum(gmask, axis=1).astype(jnp.int32)
    rf = ray_features(o, d).reshape(rp // m, m, 16)
    ids = ids.reshape(-1, 1, nsub)
    cnt = cnt.reshape(-1, 1, 1)
    tl = (None if t_limit is None
          else t_limit.reshape(rp // m, m, 1))
    return rf, ids, cnt, tl, rp, nsub


@trace_aware(static_argnames=("interpret", "bf16x3", "m", "cull_mode"))
def _mxu_search(o, d, tfq, aabbs, eps, t_limit=None, interpret: bool = False,
                bf16x3: bool = False, m: int = 128,
                cull_mode: str = "exact"):
    r = o.shape[0]
    rf, ids, cnt, _, rp, nsub = _prep_mxu(o, d, aabbs, t_limit, m, cull_mode)
    if bf16x3:
        rf_hi, rf_lo = _split_bf16(rf)
        tf_hi, tf_lo = _split_bf16(tfq)
        tensors = (rf_hi, rf_lo, tf_hi, tf_lo)
    else:
        tensors = (rf, tfq)
    grid = rp // m
    rf_spec = pl.BlockSpec((1, m, 16), lambda i, *_: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    tf_spec = pl.BlockSpec(tfq.shape, lambda i, *_: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    tensor_specs = ([rf_spec, rf_spec, tf_spec, tf_spec] if bf16x3
                    else [rf_spec, tf_spec])
    out = pl.pallas_call(
        partial(_mxu_kernel, bf16x3),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1, nsub), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                *tensor_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, m, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((grid, m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(eps, ids, cnt, *tensors)
    return out[0].reshape(-1)[:r], out[1].reshape(-1)[:r]


@trace_aware(static_argnames=("interpret", "m", "cull_mode"))
def _mxu_occl(o, d, t_limit, tfq, aabbs, eps, interpret: bool = False,
              m: int = 128, cull_mode: str = "exact"):
    r = o.shape[0]
    rf, ids, cnt, tl, rp, nsub = _prep_mxu(o, d, aabbs, t_limit, m, cull_mode)
    grid = rp // m
    out = pl.pallas_call(
        _mxu_occl_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 1, nsub), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, m, 16), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tfq.shape, lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, m, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((grid, m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(eps, ids, cnt, rf, tl, tfq)
    return out[0].reshape(-1)[:r] > 0


def _segments(tris: TriangleBuffer, exclude_oversized: bool):
    """Cluster-sort + slice into MXU_TRI_LIMIT-sized resident segments."""
    sorted_tris, perm, exclude, ov_buf, ov_orig = _clustered_tables(tris)
    seg = MXU_TRI_LIMIT
    nseg = -(-tris.capacity // seg)
    pad = nseg * seg - tris.capacity if nseg > 1 else (-tris.capacity) % SUB
    if pad:
        filler = TriangleBuffer.empty(pad)
        sorted_tris = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), sorted_tris, filler
        )
        perm = jnp.concatenate([perm, jnp.full((pad,), NO_HIT, jnp.int32)])
        exclude = jnp.concatenate([exclude, jnp.zeros((pad,), bool)])
    seg = sorted_tris.capacity // nseg

    def gen():
        for k in range(nseg):
            sl = jax.tree.map(lambda a: a[k * seg:(k + 1) * seg], sorted_tris)
            perm_k = perm[k * seg:(k + 1) * seg]
            tfq, aabbs = _pack_mxu(
                sl,
                exclude[k * seg:(k + 1) * seg] if exclude_oversized else None)
            yield tfq, aabbs, perm_k

    return gen(), ov_buf, ov_orig


def mxu_tile_search(o: jax.Array, d: jax.Array, tris: TriangleBuffer, eps,
                    t_limit: jax.Array = None, coherent: bool = False):
    """tri_search hook (core/intersect.py contract): (best_t, orig idx).

    `coherent` marks a shared-origin wavefront (camera rays) — the cull
    pre-pass then uses the interval slab test (see CULL_MODE).
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
    r = o.shape[0]
    best_t = jnp.full((r,), BIG, jnp.float32)
    best_i = jnp.full((r,), NO_HIT, jnp.int32)
    segments, ov_buf, _ = _segments(tris, exclude_oversized=False)
    import esctp1raytracer_tpu.kernels.rt_tile as _rt_tile

    if _rt_tile.PRIMARY_PREHIT:
        hint = _oversized_min_t(o, d, ov_buf, eps_arr)
        t_limit = hint if t_limit is None else jnp.minimum(t_limit, hint)
    for tfq, aabbs, perm_k in segments:
        t_k, idx_k = _mxu_search(o, d, tfq, aabbs, eps_arr, t_limit,
                                 interpret, bf16x3=SEARCH_BF16X3, m=RAY_TILE,
                                 cull_mode=_resolve_cull_mode(
                                     coherent, aabbs.shape[1]))
        orig_k = jnp.take(perm_k, jnp.maximum(idx_k, 0))
        orig_k = jnp.where(idx_k >= 0, orig_k, NO_HIT)
        better = t_k < best_t  # earlier segment wins ties (first-wins)
        best_t = jnp.where(better, t_k, best_t)
        best_i = jnp.where(better, orig_k, best_i)
    return best_t, best_i


def mxu_tile_occlusion(o: jax.Array, d: jax.Array, t_limit: jax.Array,
                       tris: TriangleBuffer, eps) -> jax.Array:
    """Occlusion [R] bool: any accepted hit in (eps, t_limit)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    # Shadow origins are per-pixel hit points (never coherent).
    cull_mode = _resolve_cull_mode(coherent=False)
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
    occluded = jnp.zeros((o.shape[0],), bool)
    segments, ov_buf, _ = _segments(tris, exclude_oversized=True)
    for tfq, aabbs, _ in segments:
        occluded |= _mxu_occl(o, d, t_limit, tfq, aabbs, eps_arr, interpret,
                              m=RAY_TILE, cull_mode=cull_mode)
    return occluded | _oversized_occl(o, d, t_limit, ov_buf, eps_arr)


mxu_tile_search.occlusion = mxu_tile_occlusion
mxu_tile_search.supports_coherent = True

"""Ray-lane Pallas kernel: brute force for small primitive tables.

The retired round-1 bundle kernel put triangles on the VPU lanes and
rays on the scalar unit — right when the table is large and per-bundle
culling pays. For small tables (Cornell's 36 triangles, anything under a
few thousand) its per-ray overhead floor dominates. This kernel is the
transpose: **every VPU lane is a ray**, and a scalar loop walks the
triangle list, broadcasting each triangle's plane/barycentric constants
from SMEM — the reference's `scan_row` pixel loop (src/main.cpp:698-882)
vectorized over 1024 pixels at a time, with the closest-hit in/out
contract (`t2 >= t -> reject`, src/scene/ray_triangle.h:48) becoming a
lane-wise running (t, index) minimum that never leaves registers.

Cost: ~37 VPU ops per triangle per 1024 rays, no reductions at all (each
lane IS a ray), so a 36-triangle frame costs ~1.4k cycles per 1024 rays
per sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esctp1raytracer_tpu.core.intersect import BIG, NO_HIT
from esctp1raytracer_tpu.utils.tracejit import trace_aware
from esctp1raytracer_tpu.scene.types import TriangleBuffer

RAYS_PER_STEP = 1024  # one (8, 128) tile of rays per grid step
LANE_TRI_LIMIT = 4096  # SMEM constant table: 13 * N * 4 B (~213 KB at 4k)


def lane_tri_constants(tris: TriangleBuffer):
    """Per-triangle plane + barycentric constants, SMEM layout [1, 13N].

    Order per triangle: nx ny nz nv0 wux wuy wuz bu wvx wvy wvz bv valid.
    Original triangle order is kept (no sort): the loop index IS the
    original index and first-wins ties fall out of the strict compare.
    """
    e1 = tris.v1 - tris.v0
    e2 = tris.v2 - tris.v0
    nrm = jnp.cross(e1, e2)
    # Invalid triangles get a zero normal -> det == 0 -> rejected in the
    # kernel with no per-pair valid test.
    nrm = jnp.where(tris.valid[:, None], nrm, 0.0)
    nn = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
    nn = jnp.where(nn > 0, nn, 1.0)
    w_u = jnp.cross(e2, nrm) / nn
    w_v = jnp.cross(nrm, e1) / nn
    cols = jnp.stack(
        [
            nrm[:, 0], nrm[:, 1], nrm[:, 2],
            jnp.sum(nrm * tris.v0, axis=-1),
            w_u[:, 0], w_u[:, 1], w_u[:, 2],
            -jnp.sum(w_u * tris.v0, axis=-1),
            w_v[:, 0], w_v[:, 1], w_v[:, 2],
            -jnp.sum(w_v * tris.v0, axis=-1),
            tris.valid.astype(jnp.float32),
        ],
        axis=1,
    )  # [N, 13]
    return cols.reshape(1, -1)


def _lane_kernel(eps_ref, n_ref, tcs_ref, rays_ref, t_ref, idx_ref):
    eps = eps_ref[0]
    big = jnp.float32(BIG)
    ox = rays_ref[0, 0:8, :]
    oy = rays_ref[0, 8:16, :]
    oz = rays_ref[0, 16:24, :]
    dx = rays_ref[0, 24:32, :]
    dy = rays_ref[0, 32:40, :]
    dz = rays_ref[0, 40:48, :]

    def body(i, carry):
        bt, bi = carry
        base = i * 13
        nx = tcs_ref[0, base + 0]
        ny = tcs_ref[0, base + 1]
        nz = tcs_ref[0, base + 2]
        nv0 = tcs_ref[0, base + 3]
        wux = tcs_ref[0, base + 4]
        wuy = tcs_ref[0, base + 5]
        wuz = tcs_ref[0, base + 6]
        bu = tcs_ref[0, base + 7]
        wvx = tcs_ref[0, base + 8]
        wvy = tcs_ref[0, base + 9]
        wvz = tcs_ref[0, base + 10]
        bv = tcs_ref[0, base + 11]
        det = -(dx * nx + dy * ny + dz * nz)
        ok_det = jnp.abs(det) >= eps
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        t = ((ox * nx + oy * ny + oz * nz) - nv0) * inv
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        u = wux * px + wuy * py + wuz * pz + bu
        v = wvx * px + wvy * py + wvz * pz + bv
        # u <= 1 implied by v >= eps & u+v <= 1; invalid triangles have
        # n = 0 so det == 0 rejects them.
        ok = (
            ok_det
            & (jnp.minimum(u, v) >= eps)
            & (u + v <= 1.0)
            & (t >= eps)
        )
        t = jnp.where(ok, t, big)
        better = t < bt  # strict: first (lowest-index) winner on ties
        return (jnp.where(better, t, bt),
                jnp.where(better, jnp.full((8, 128), i, jnp.int32), bi))

    init = (jnp.full((8, 128), big, jnp.float32),
            jnp.full((8, 128), NO_HIT, jnp.int32))
    bt, bi = jax.lax.fori_loop(0, n_ref[0], body, init)
    t_ref[0] = bt
    idx_ref[0] = bi


@trace_aware(static_argnames=("interpret",))
def _lane_search(o, d, tcs, n_tris, eps, interpret: bool = False):
    r = o.shape[0]
    pad = (-r) % RAYS_PER_STEP
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    rp = r + pad
    steps = rp // RAYS_PER_STEP

    # [steps, 48, 128]: six components, each an (8, 128) tile of rays.
    comps = jnp.concatenate([o, d], axis=1)  # [rp, 6]
    rays = comps.T.reshape(6, steps, 8, 128).transpose(1, 0, 2, 3)
    rays = rays.reshape(steps, 48, 128)

    out = pl.pallas_call(
        _lane_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # eps, n_tris
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(tcs.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 48, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((steps, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((steps, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(eps, n_tris, tcs, rays)
    return out[0].reshape(-1)[:r], out[1].reshape(-1)[:r]


def lane_tri_search(o: jax.Array, d: jax.Array, tris: TriangleBuffer, eps,
                    t_limit: jax.Array = None):
    """tri_search hook (see core/intersect.py) for small tables.

    t_limit is accepted for interface parity; with no per-block structure
    there is nothing to cull, and the caller's best_t < t_limit compare
    already bounds the answer.
    """
    n = tris.capacity
    if n > LANE_TRI_LIMIT:
        raise ValueError(
            f"lane kernel supports up to {LANE_TRI_LIMIT} triangles; got {n}"
        )
    tcs = lane_tri_constants(tris)
    # Loop bound: one past the last valid triangle (builders pack valid
    # first, so this equals the count; a sparse table still loops far
    # enough, and padded slots are rejected by det == 0 / vld == 0).
    iota = jnp.arange(n, dtype=jnp.int32)
    n_tris = (jnp.max(jnp.where(tris.valid, iota, -1)) + 1).reshape(1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)
    return _lane_search(o, d, tcs, n_tris, eps_arr, interpret)

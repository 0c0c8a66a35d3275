"""Fully-fused depth-1 frame kernel for small scenes (lane layout).

One Pallas launch per 1024-ray tile computes the ENTIRE reference
pipeline — closest hit over triangles and spheres, material/normal
selection, shadow ray toward the (precomputed) light sample, occlusion,
and the Phong/Blinn accumulate (reference src/main.cpp:698-882 fused the
same way its scan_row pixel loop was) — with every intermediate in
vector registers. The split pipeline pays ~150 elementwise XLA passes of
glue between kernels; at Cornell size that glue is ~95% of the frame.

Layout: every VPU lane is a ray (see lane_pallas.py). Scalar loops walk
the triangle/sphere constant tables in SMEM four times: closest-hit,
winner material select (predicated on the carried winner index), and two
occlusion sweeps. No gathers, no reductions, no HBM round trips.

Scope (the caller falls back to the split pipeline otherwise):
depth == 1, exactly one light source, triangle capacity <= FUSED_TRI_LIMIT.
Spheres and smooth normals are fully supported. Differentiation is exact:
a custom VJP re-runs the standard differentiable path for the backward,
so gradients equal the split pipeline's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esctp1raytracer_tpu.core.intersect import BIG
from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_constants
from esctp1raytracer_tpu.scene.types import Scene

RAYS_PER_STEP = 1024
FUSED_TRI_LIMIT = 2048   # 36 SMEM floats per triangle
_TINY = 1e-12
_MAT_F = 23  # ka3 kd3 ks3 ke3 ns has_n n0(3) n1(3) n2(3)
_SPH_F = 19  # c3 r inv_r ka3 kd3 ks3 ke3 ns valid


def _mat_constants(tris) -> jax.Array:
    cols = jnp.concatenate(
        [tris.ka, tris.kd, tris.ks, tris.ke, tris.ns[:, None],
         tris.has_normals[:, None].astype(jnp.float32),
         tris.n0, tris.n1, tris.n2], axis=1)  # [N, 23]
    return cols.reshape(1, -1)


def _sph_constants(spheres) -> jax.Array:
    r = spheres.radius
    inv_r = 1.0 / jnp.maximum(r, 1e-6)
    cols = jnp.concatenate(
        [spheres.center, r[:, None], inv_r[:, None],
         spheres.ka, spheres.kd, spheres.ks, spheres.ke,
         spheres.ns[:, None],
         spheres.valid[:, None].astype(jnp.float32)], axis=1)  # [M, 19]
    return cols.reshape(1, -1)


def _fused_kernel(eps_ref, cnt_ref, tcs_ref, mats_ref, sps_ref,
                  rays_ref, pl_ref, col_ref):
    eps = eps_ref[0]
    sh_eps = eps_ref[1]
    nt = cnt_ref[0]
    nt_cap = cnt_ref[1]  # static capacity marker separating tri/sphere ids
    ns_ = cnt_ref[2]
    big = jnp.float32(BIG)

    ox = rays_ref[0, 0:8, :]
    oy = rays_ref[0, 8:16, :]
    oz = rays_ref[0, 16:24, :]
    dx = rays_ref[0, 24:32, :]
    dy = rays_ref[0, 32:40, :]
    dz = rays_ref[0, 40:48, :]
    px_l = pl_ref[0, 0:8, :]
    py_l = pl_ref[0, 8:16, :]
    pz_l = pl_ref[0, 16:24, :]

    def mt(i, oox, ooy, ooz, ddx, ddy, ddz):
        """Triangle i against the ray tile; returns (t [8,128], u, v)
        with t = BIG on reject (same algebra as lane_pallas)."""
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
        det = -(ddx * nx + ddy * ny + ddz * nz)
        ok_det = jnp.abs(det) >= eps
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        t = ((oox * nx + ooy * ny + ooz * nz) - nv0) * inv
        hx = oox + t * ddx
        hy = ooy + t * ddy
        hz = ooz + t * ddz
        u = wux * hx + wuy * hy + wuz * hz + bu
        v = wvx * hx + wvy * hy + wvz * hz + bv
        ok = (ok_det & (jnp.minimum(u, v) >= eps) & (u + v <= 1.0)
              & (t >= eps))
        return jnp.where(ok, t, big), u, v

    def sph(j, oox, ooy, ooz, ddx, ddy, ddz):
        """Sphere j against the ray tile; t = BIG on reject."""
        base = j * _SPH_F
        cx = sps_ref[0, base + 0]
        cy = sps_ref[0, base + 1]
        cz = sps_ref[0, base + 2]
        r = sps_ref[0, base + 3]
        vld = sps_ref[0, base + 18]
        ocx = oox - cx
        ocy = ooy - cy
        ocz = ooz - cz
        b = ocx * ddx + ocy * ddy + ocz * ddz
        c0 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tn = -b - sq
        tf = -b + sq
        t = jnp.where(tn >= eps, tn, tf)
        ok = (disc >= 0.0) & (t >= eps) & (vld > 0.0)
        return jnp.where(ok, t, big)

    # ---- closest hit: triangles then spheres (strict < keeps the
    # lowest-index winner, and spheres only beat strictly-closer tris,
    # matching argmin_hit's is_sphere = sph_t < tri_t rule) -------------
    def tri_body(i, carry):
        bt, bi, bu_, bv_ = carry
        t, u, v = mt(i, ox, oy, oz, dx, dy, dz)
        better = t < bt
        ii = jnp.full((8, 128), i, jnp.int32)
        return (jnp.where(better, t, bt), jnp.where(better, ii, bi),
                jnp.where(better, u, bu_), jnp.where(better, v, bv_))

    init = (jnp.full((8, 128), big, jnp.float32),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32))
    bt, bi, bu_, bv_ = jax.lax.fori_loop(0, nt, tri_body, init)

    def sph_body(j, carry):
        bt, bi = carry
        t = sph(j, ox, oy, oz, dx, dy, dz)
        better = t < bt
        jj = jnp.full((8, 128), nt_cap + j, jnp.int32)
        return jnp.where(better, t, bt), jnp.where(better, jj, bi)

    bt, bi = jax.lax.fori_loop(0, ns_, sph_body, (bt, bi))

    # ---- winner material/normal select (predicated, no gathers) -------
    zeros = jnp.zeros((8, 128), jnp.float32)
    mat = [zeros] * 13          # ka3 kd3 ks3 ke3 ns
    nrm = [zeros, zeros, zeros]

    def mat_tri(i, carry):
        mat = list(carry[:13])
        nrm = list(carry[13:16])
        m = bi == i
        base = i * _MAT_F
        for k in range(13):
            mat[k] = jnp.where(m, mats_ref[0, base + k], mat[k])
        has_n = mats_ref[0, base + 13]
        tb = i * 13
        # geometric normal = the (unnormalized) plane normal; smooth =
        # barycentric blend of the vertex normals (normalized later).
        w0 = 1.0 - bu_ - bv_
        for a in range(3):
            n_geo = tcs_ref[0, tb + a]
            n_sm = (mats_ref[0, base + 17 + a] * bu_
                    + mats_ref[0, base + 20 + a] * bv_
                    + mats_ref[0, base + 14 + a] * w0)
            pick = jnp.where(has_n > 0.5, n_sm, n_geo)
            nrm[a] = jnp.where(m, pick, nrm[a])
        return tuple(mat) + tuple(nrm)

    sel = jax.lax.fori_loop(0, nt, mat_tri, tuple(mat) + tuple(nrm))
    mat, nrm = list(sel[:13]), list(sel[13:16])

    # hit point (reference back-off: t - shadow_eps, src/main.cpp:763)
    hit = bt < big
    t_safe = jnp.where(hit, bt, 1.0) - sh_eps
    hx = ox + dx * t_safe
    hy = oy + dy * t_safe
    hz = oz + dz * t_safe

    def mat_sph(j, carry):
        mat = list(carry[:13])
        nrm = list(carry[13:16])
        m = bi == nt_cap + j
        base = j * _SPH_F
        for k in range(13):
            mat[k] = jnp.where(m, sps_ref[0, base + 5 + k], mat[k])
        inv_r = sps_ref[0, base + 4]
        for a, h in enumerate((hx, hy, hz)):
            nrm[a] = jnp.where(m, (h - sps_ref[0, base + a]) * inv_r, nrm[a])
        return tuple(mat) + tuple(nrm)

    sel = jax.lax.fori_loop(0, ns_, mat_sph, tuple(mat) + tuple(nrm))
    mat, nrm = list(sel[:13]), list(sel[13:16])

    # normalize the selected normal
    nn = nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]
    inv_n = jax.lax.rsqrt(jnp.maximum(nn, _TINY))
    n0, n1, n2 = nrm[0] * inv_n, nrm[1] * inv_n, nrm[2] * inv_n

    # ---- shadow ray toward the light sample ---------------------------
    lvx = px_l - hx
    lvy = py_l - hy
    lvz = pz_l - hz
    d2 = jnp.maximum(lvx * lvx + lvy * lvy + lvz * lvz, _TINY)
    dist = jnp.sqrt(d2)
    inv_d = 1.0 / dist
    lx, ly, lz = lvx * inv_d, lvy * inv_d, lvz * inv_d
    tlim = dist - sh_eps

    def occ_tri(i, occ):
        t, _, _ = mt(i, hx, hy, hz, lx, ly, lz)
        return occ | (t < tlim)

    occ = jax.lax.fori_loop(0, nt, occ_tri,
                            jnp.zeros((8, 128), bool))

    def occ_sph(j, occ):
        t = sph(j, hx, hy, hz, lx, ly, lz)
        return occ | (t < tlim)

    occ = jax.lax.fori_loop(0, ns_, occ_sph, occ)

    # ---- Phong/Blinn accumulate (single light: /L = /1) ----------------
    dnl = n0 * lx + n1 * ly + n2 * lz
    hvx, hvy, hvz = (n0 + lx) * 2.0, (n1 + ly) * 2.0, (n2 + lz) * 2.0
    hn = jax.lax.rsqrt(jnp.maximum(hvx * hvx + hvy * hvy + hvz * hvz, _TINY))
    spec_dot = jnp.maximum((n0 * hvx + n1 * hvy + n2 * hvz) * hn, 0.0)
    spec = jnp.power(jnp.maximum(spec_dot, _TINY), mat[12])
    visible = hit & jnp.logical_not(occ) & (dnl > 0.0)
    for ch in range(3):
        base = mat[ch] * 0.5 + mat[9 + ch]          # ka*0.5 + ke
        lit = mat[3 + ch] * dnl + mat[6 + ch] * spec  # kd*d + ks*spec
        col_ref[0, 8 * ch:8 * ch + 8, :] = jnp.where(visible, base + lit, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def _fused_call(o, d, p_light, tcs, mats, sps, cnts, epses,
                interpret: bool = False):
    r = o.shape[0]
    pad = (-r) % RAYS_PER_STEP
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        p_light = jnp.concatenate([p_light, jnp.zeros((pad, 3), p_light.dtype)])
    rp = r + pad
    steps = rp // RAYS_PER_STEP

    def tile6(a):
        return (a.T.reshape(a.shape[1], steps, 8, 128)
                .transpose(1, 0, 2, 3).reshape(steps, 8 * a.shape[1], 128))

    rays = tile6(jnp.concatenate([o, d], axis=1))        # [steps, 48, 128]
    plt = tile6(p_light)                                  # [steps, 24, 128]

    out = pl.pallas_call(
        _fused_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # epses, cnts
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(tcs.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(mats.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(sps.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 48, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 24, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 24, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((steps, 24, 128), jnp.float32)],
        interpret=interpret,
    )(epses, cnts, tcs, mats, sps, rays, plt)
    col = out[0].reshape(steps, 3, 8, 128).transpose(0, 2, 3, 1)
    return col.reshape(-1, 3)[:r]


def fused_supported(scene: Scene, depth: int) -> bool:
    """Static-shape gate for the fused path."""
    return (depth == 1
            and scene.lights.num_lights == 1
            and scene.triangles.capacity <= FUSED_TRI_LIMIT)


def _primal(o, d, p_light, scene, eps: float, shadow_eps: float):
    tcs = lane_tri_constants(scene.triangles)
    mats = _mat_constants(scene.triangles)
    sps = _sph_constants(scene.spheres)
    nt_cap = scene.triangles.capacity
    iota_t = jnp.arange(nt_cap, dtype=jnp.int32)
    nt = jnp.max(jnp.where(scene.triangles.valid, iota_t, -1)) + 1
    iota_s = jnp.arange(scene.spheres.capacity, dtype=jnp.int32)
    ns_ = jnp.max(jnp.where(scene.spheres.valid, iota_s, -1)) + 1
    cnts = jnp.stack([nt, jnp.int32(nt_cap), ns_]).astype(jnp.int32)
    epses = jnp.asarray([eps, shadow_eps], jnp.float32)
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _fused_call(o, d, p_light, tcs, mats, sps, cnts, epses, interpret)


def _standard(o, d, p_light, scene, eps: float, shadow_eps: float):
    """The split differentiable pipeline with the same light sample —
    used as the exact backward of the fused kernel."""
    from esctp1raytracer_tpu.core.intersect import any_hit, closest_hit
    from esctp1raytracer_tpu.core.shading import shade

    e = jnp.float32(eps)
    hit = closest_hit(o, d, scene, e)

    def occl(oo, dd, tl):
        return any_hit(oo, dd, tl, scene, e)

    ids = jnp.zeros((o.shape[0],), jnp.uint32)  # unused: p_light is given
    color, _, _, _ = shade(o, d, hit, scene, 0, ids, occl,
                           shadow_eps=shadow_eps,
                           p_light=p_light[:, None, :])
    return color


def make_fused_render(eps: float, shadow_eps: float):
    """A custom-VJP fused renderer specialized to (eps, shadow_eps):
    forward = one Pallas launch; backward = VJP of the standard split
    pipeline on the saved inputs (gradients are exactly the split
    pipeline's)."""

    @jax.custom_vjp
    def fused(o, d, p_light, scene):
        return _primal(o, d, p_light, scene, eps, shadow_eps)

    def fwd(o, d, p_light, scene):
        return fused(o, d, p_light, scene), (o, d, p_light, scene)

    def bwd(res, ct):
        o, d, p_light, scene = res
        _, vjp = jax.vjp(
            lambda oo, dd, pp, sc: _standard(oo, dd, pp, sc, eps, shadow_eps),
            o, d, p_light, scene)
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


_FUSED_CACHE = {}


def fused_render(o, d, p_light, scene, eps: float, shadow_eps: float):
    key = (float(eps), float(shadow_eps))
    fn = _FUSED_CACHE.get(key)
    if fn is None:
        _FUSED_CACHE[key] = fn = make_fused_render(*key)
    return fn(o, d, p_light, scene)

"""Fully-fused frame kernel: rays in, shaded colors out, ONE Pallas call.

For small primitive tables the frame cost is not the intersection math —
the lane kernel sweeps Cornell's 36 triangles in ~1 ms — it is the XLA
glue around it: winner gathers, light sampling, the second occlusion
dispatch, and the layout shuffles between them (ROOFLINE.md measures the
Cornell frame at ~95% glue). This kernel is the reference's whole
per-pixel loop (`scan_row`, src/main.cpp:698-882: intersect -> shade ->
shadow ray -> accumulate) as a single TPU program over 1024 rays at a
time, the way the ISPC backend fused it (src/ispc/trace.ispc:86-272):

* primary closest hit: scalar loop over SMEM triangle plane/barycentric
  constants (the lane kernel's search) plus the analytic sphere table;
* winner attributes (vertices, normals, material) fetched by a second
  loop of per-lane selects — TPUs have no per-lane SMEM gather, so the
  gather IS a masked scan, amortized over 1024 rays;
* t/u/v recomputed with the classic Möller–Trumbore cross-product form
  on the winning triangle — the same arithmetic `closest_hit` uses
  (core/intersect.py), so hit points land where the XLA path puts them;
* light sampling with the murmur3 counter RNG of utils/rng.py evaluated
  in uint32 vector ops — draw-for-draw identical to the XLA path, so
  the fused image equals the lane-backend image;
* per-light shadow any-hit (OR-fold over the same constants, t-ceiling
  window) and the exact reference Phong contribution
  ((ka*0.5+ke)/L + (kd*d + ks*dot(N,H)^Ns)/L, visibility-gated,
  src/main.cpp:769-788).

Depth up to FUSED_DEPTH_LIMIT unrolls the Whitted reflection loop
inside the kernel (see _make_kernel) — the whole depth-4 frame is still
ONE Pallas call. Gradients: `fused_trace_diff` wraps the kernel in a
custom VJP that re-derives the backward through the XLA shading path at
identical RNG draws, so `backend="auto"` routes here grad-safely;
`fused_supported` gates on the static scene/config shape and the caller
falls back to the lane/tile path otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esctp1raytracer_tpu.core.intersect import BIG, NO_HIT
from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_constants
from esctp1raytracer_tpu.scene.types import Scene

RAYS_PER_STEP = 1024  # one (8, 128) tile of rays per grid step
FUSED_TRI_LIMIT = 2048  # SMEM: (13 + 32) * N * 4 B = 360 KB at 2048
FUSED_CHUNK = 128  # triangles per cullable sweep chunk (= clusters.CLUSTER)
_SHAD_W = 32  # v0 v1 v2 n0 n1 n2 has_n ka kd ks ke ns
_SPH_W = 18  # center radius valid ka kd ks ke ns
_TINY = np.float32(1e-12)
_FETCH_HUGE = np.int32(2**30)  # > any triangle index: empty fetch window

# murmur3 constants — must match utils/rng.py bit-for-bit.
_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_GOLDEN = 0x9E3779B9
_U32 = 1 << 32


FUSED_DEPTH_LIMIT = 4  # static in-kernel bounce unroll (render.py depth)
FUSED_SPHERE_LIMIT = 32  # spheres are Python-unrolled per bounce
FUSED_LIGHT_FACE_LIMIT = 64  # L*F corner selects are unrolled per bounce


def fused_supported(scene: Scene, depth: int, light_mode: str) -> bool:
    """Static gate: everything here is known at trace time (no tracers).

    The sphere count, light count, and per-light face table are all
    statically unrolled in the kernel (and the light corners are
    SMEM-resident), so they bound eligibility too — many-faced emissive
    meshes or large sphere tables fall back to the lane/tile path
    instead of blowing up compile time or SMEM.
    """
    return (
        1 <= depth <= FUSED_DEPTH_LIMIT
        and light_mode == "area"
        and scene.lights.num_lights >= 1
        and scene.triangles.capacity <= FUSED_TRI_LIMIT
        and scene.spheres.capacity <= FUSED_SPHERE_LIMIT
        and scene.lights.num_lights * scene.lights.max_faces
        <= FUSED_LIGHT_FACE_LIMIT
    )


def fused_tables(scene: Scene):
    """SMEM-resident tables: intersection constants + shading attributes.

    Round 5: triangles are Morton-cluster-sorted (accel/clusters.py) and
    padded to a FUSED_CHUNK multiple, and per-chunk AABBs ride along —
    the kernel culls whole chunks per sweep against the masked interval
    hull of each 1024-ray tile, replacing the zero-cull brute-force
    sweeps that lost 1.41x to the mxtile bounce loop on the depth-4
    mixed config (scripts/probe_d4_backend.py). Sorting also tightens
    the winner-fetch index windows (coherent rays' winners cluster
    spatially = contiguously in sorted order).

    Returns (tcs [1,13N], shad [1,32N], sph [1,18S], lcorners [1,L*F*9],
    cab [1,G*6] chunk AABBs, counts [L] int32, n_tris [1] int32) with N
    the padded sorted capacity and G = N // FUSED_CHUNK. The light
    corner table indexes the ORIGINAL buffer (lights reference original
    triangle ids), so it is built before the sort.
    """
    from esctp1raytracer_tpu.accel.clusters import build_clusters
    from esctp1raytracer_tpu.scene.types import TriangleBuffer

    tris0 = scene.triangles
    packed0 = jnp.concatenate([tris0.v0, tris0.v1, tris0.v2], axis=1)
    pad = (-tris0.capacity) % FUSED_CHUNK
    tpad = tris0
    if pad:
        filler = TriangleBuffer.empty(pad)
        tpad = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), tris0, filler
        )
    clustered = build_clusters(tpad)
    tris = clustered.tris
    # Chunk AABBs: build_clusters' CLUSTER granularity == FUSED_CHUNK.
    # Invalid triangles carry inverted sentinel boxes; an all-invalid
    # chunk stays inverted (min > max) and the kernel drops it
    # explicitly (the interval slab test would conservatively keep it).
    cab = jnp.concatenate(
        [clustered.cluster_min, clustered.cluster_max], axis=1
    )  # [G, 6]
    tcs = lane_tri_constants(tris)
    shad = jnp.concatenate(
        [
            tris.v0, tris.v1, tris.v2, tris.n0, tris.n1, tris.n2,
            tris.has_normals[:, None].astype(jnp.float32),
            tris.ka, tris.kd, tris.ks, tris.ke, tris.ns[:, None],
        ],
        axis=1,
    )  # [N, 32]
    sph = scene.spheres
    spht = jnp.concatenate(
        [
            sph.center, sph.radius[:, None],
            sph.valid[:, None].astype(jnp.float32),
            sph.ka, sph.kd, sph.ks, sph.ke, sph.ns[:, None],
        ],
        axis=1,
    )  # [S, 18]
    lt = scene.lights
    lc = jnp.take(packed0, lt.tri_idx, axis=0)  # [L, F, 9] (original ids)
    iota = jnp.arange(tris.capacity, dtype=jnp.int32)
    n_tris = (jnp.max(jnp.where(tris.valid, iota, -1)) + 1).reshape(1)
    return (tcs, shad.reshape(1, -1), spht.reshape(1, -1),
            lc.reshape(1, -1), cab.reshape(1, -1),
            lt.face_count.astype(jnp.int32), n_tris)


def _stream_const(stream: int) -> np.uint32:
    """Host-side stream mixing constant: (stream * C1 + GOLDEN) mod 2^32."""
    return np.uint32((stream * _C1 + _GOLDEN) % _U32)


def _make_kernel(S: int, L: int, F: int, seed: int, eps: float,
                 shadow_eps: float, depth: int = 1, G: int = 1):
    """Build the frame kernel for static (sphere count, lights, faces, cfg).

    depth > 1 unrolls the iterative Whitted reflection loop of
    trace_rays (core/render.py) INSIDE the kernel: each bounce re-runs
    search + shade on the reflected wavefront with (origin, direction,
    throughput, active) carried in vector registers — no hit-info round
    trip through HBM between bounces. RNG streams are (bounce*1024+l)*4
    + {0,1,2}, matching core/shading.py:sample_lights draw-for-draw.

    G = number of FUSED_CHUNK-triangle chunks. Every sweep (bounce
    search and per-light shadow) first builds a compacted chunk list in
    SMEM scratch from a conservative interval slab test of the tile's
    *masked* ray hull (active lanes for search; active & hit & lit
    lanes for shadow) against the chunk AABBs, then loops exactly that
    list — culling by loop bound, the architectural rule from
    ROOFLINE.md (mid-loop exits lose to pipelined fixed sweeps). Tiles
    whose rays all died skip later-bounce sweeps entirely (cnt = 0).
    """
    # numpy scalars only: jnp constants would be captured tracers, which
    # pallas_call rejects — np scalars embed as literals.
    epsf = np.float32(eps)
    sh_eps = np.float32(shadow_eps)
    big = np.float32(BIG)
    tiny = np.float32(_TINY)
    inv_l = np.float32(1.0 / L)
    s0 = np.uint32((int(np.uint32(seed)) + _GOLDEN) % _U32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    u16 = np.uint32(16)
    u13 = np.uint32(13)
    u8 = np.uint32(8)
    to_unit = np.float32(1.0 / (1 << 24))

    def fmix(h):
        h = h ^ (h >> u16)
        h = h * c1
        h = h ^ (h >> u13)
        h = h * c2
        h = h ^ (h >> u16)
        return h

    def uniform(h0, stream_const):
        bits = fmix(h0 ^ stream_const)
        # u32 -> f32 via i32: bits>>8 < 2^24 fits int32 exactly.
        return (bits >> u8).astype(jnp.int32).astype(jnp.float32) * to_unit

    def kernel(n_ref, cnt_ref, tcs_ref, shad_ref, sph_ref, lc_ref,
               cab_ref, rays_ref, ids_ref, out_ref, list_ref):
        fbig = np.float32(3.4e38)
        # Valid triangles form a prefix of the cluster-sorted table
        # (invalid padding sorts last), so every chunk sweep clamps to
        # n_tris — a 36-triangle Cornell in a 128-padded chunk sweeps 36
        # iterations, not 128 (the unclamped version cost the Cornell
        # frame 2.5x).
        n_tris = n_ref[0]

        def chunk_cull(mask, cox, coy, coz, cdx, cdy, cdz, tmax=None):
            """Compacted chunk list for one sweep -> count (int32 scalar).

            Masked interval hull of the tile's rays (lanes outside
            `mask` contribute nothing), then one scalar slab test per
            chunk AABB — conservative exactly like cull.group_cull_mask:
            a culled chunk provably intersects no masked ray within
            [0, tmax], so the per-pair tests of kept chunks reproduce
            the full sweep's accepted set (and first-wins order: the
            list is ascending). All-invalid chunks (inverted sentinel
            boxes, which an interval test keeps) are dropped explicitly.
            """
            live = jnp.max(jnp.where(mask, 1, 0)) > 0
            if G == 1:
                # One chunk: the hull test can cull nothing — keep the
                # chunk iff it is non-empty and any lane is live (the
                # dead-tile bounce skip still applies). No list write:
                # the G == 1 sweeps below run flat with bound cnt*n_tris.
                keep = (cab_ref[0, 0] <= cab_ref[0, 3]) & live
                return keep.astype(jnp.int32)

            def mn(v):
                return jnp.min(jnp.where(mask, v, fbig))

            def mx(v):
                return jnp.max(jnp.where(mask, v, -fbig))

            o_lo = (mn(cox), mn(coy), mn(coz))
            o_hi = (mx(cox), mx(coy), mx(coz))
            d_lo = (mn(cdx), mn(cdy), mn(cdz))
            d_hi = (mx(cdx), mx(cdy), mx(cdz))
            # Per-axis interval reciprocals (chunk-independent).
            il, ih, unb = [], [], []
            for a in range(3):
                u = (d_lo[a] <= 0.0) & (d_hi[a] >= 0.0)
                ia = 1.0 / jnp.where(u, 1.0, d_hi[a])
                ib = 1.0 / jnp.where(u, 1.0, d_lo[a])
                il.append(jnp.minimum(ia, ib))
                ih.append(jnp.maximum(ia, ib))
                unb.append(u)
            cnt = jnp.int32(0)
            for g in range(G):
                base = g * 6
                near_all = np.float32(-3.4e38)
                far_all = fbig
                for a in range(3):
                    bmin = cab_ref[0, base + a]
                    bmax = cab_ref[0, base + 3 + a]
                    lo1 = bmin - o_hi[a]
                    hi1 = bmin - o_lo[a]
                    lo2 = bmax - o_hi[a]
                    hi2 = bmax - o_lo[a]
                    p0 = lo1 * il[a]
                    p1 = lo1 * ih[a]
                    p2 = hi1 * il[a]
                    p3 = hi1 * ih[a]
                    p4 = lo2 * il[a]
                    p5 = lo2 * ih[a]
                    p6 = hi2 * il[a]
                    p7 = hi2 * ih[a]
                    near = jnp.minimum(
                        jnp.minimum(jnp.minimum(p0, p1), jnp.minimum(p2, p3)),
                        jnp.minimum(jnp.minimum(p4, p5), jnp.minimum(p6, p7)))
                    far = jnp.maximum(
                        jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3)),
                        jnp.maximum(jnp.maximum(p4, p5), jnp.maximum(p6, p7)))
                    near = jnp.where(unb[a], -fbig, near)
                    far = jnp.where(unb[a], fbig, far)
                    near_all = jnp.maximum(near_all, near)
                    far_all = jnp.minimum(far_all, far)
                keep = jnp.logical_not((near_all > far_all) | (far_all < 0.0))
                if tmax is not None:
                    keep &= jnp.logical_not(near_all > tmax)
                # Non-empty chunk + at least one masked lane in the tile.
                keep &= cab_ref[0, base] <= cab_ref[0, base + 3]
                keep &= live

                @pl.when(keep)
                def _():
                    list_ref[0, cnt] = np.int32(g)

                cnt = cnt + keep.astype(jnp.int32)
            return cnt

        ox = rays_ref[0, 0:8, :]
        oy = rays_ref[0, 8:16, :]
        oz = rays_ref[0, 16:24, :]
        dx = rays_ref[0, 24:32, :]
        dy = rays_ref[0, 32:40, :]
        dz = rays_ref[0, 40:48, :]
        ids = ids_ref[0].astype(jnp.uint32)
        h0 = fmix(ids ^ s0)
        zero = jnp.zeros((8, 128), jnp.float32)
        one = jnp.ones((8, 128), jnp.float32)
        col_r, col_g, col_b = zero, zero, zero
        thr_r, thr_g, thr_b = one, one, one
        active = jnp.full((8, 128), True)

        for b in range(depth):
            # ---- primary closest hit: triangles (plane constants),
            # chunk-culled: sweep only the chunks whose AABB the active
            # lanes' interval hull can reach ------------------------------
            cnt_c = chunk_cull(active, ox, oy, oz, dx, dy, dz)

            def search(i, carry):
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
                ok_det = jnp.abs(det) >= epsf
                inv = 1.0 / jnp.where(ok_det, det, 1.0)
                t = ((ox * nx + oy * ny + oz * nz) - nv0) * inv
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                u = wux * px + wuy * py + wuz * pz + bu
                v = wvx * px + wvy * py + wvz * pz + bv
                ok = (ok_det & (jnp.minimum(u, v) >= epsf)
                      & (u + v <= 1.0) & (t >= epsf))
                t = jnp.where(ok, t, big)
                better = t < bt
                return (jnp.where(better, t, bt),
                        jnp.where(better, jnp.full((8, 128), i, jnp.int32), bi))

            init_c = (jnp.full((8, 128), big, jnp.float32),
                      jnp.full((8, 128), NO_HIT, jnp.int32))
            if G == 1:
                # Flat sweep, no chunk indirection: bound is 0 (tile
                # dead / empty table) or n_tris.
                bt, bi = jax.lax.fori_loop(0, cnt_c * n_tris, search, init_c)
            else:
                def search_chunk(k, carry):
                    c0 = list_ref[0, k] * np.int32(FUSED_CHUNK)
                    hi = jnp.minimum(c0 + np.int32(FUSED_CHUNK), n_tris)
                    return jax.lax.fori_loop(c0, hi, search, carry)

                bt, bi = jax.lax.fori_loop(0, cnt_c, search_chunk, init_c)

            # ---- primary closest hit: spheres (analytic) --------------------
            def sphere_t(j, sox, soy, soz, sdx, sdy, sdz):
                b0 = j * _SPH_W
                cx = sph_ref[0, b0 + 0]
                cy = sph_ref[0, b0 + 1]
                cz = sph_ref[0, b0 + 2]
                r = sph_ref[0, b0 + 3]
                vld = sph_ref[0, b0 + 4]
                ocx = sox - cx
                ocy = soy - cy
                ocz = soz - cz
                b = ocx * sdx + ocy * sdy + ocz * sdz
                c0 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c0
                pos = disc > 0.0
                sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
                tn = -b - sq
                t = jnp.where(tn >= epsf, tn, -b + sq)
                ok = (disc >= 0.0) & (t >= epsf) & (vld > 0.5)
                return jnp.where(ok, t, big)

            bst = jnp.full((8, 128), big, jnp.float32)
            bsi = jnp.full((8, 128), NO_HIT, jnp.int32)
            for j in range(S):
                t = sphere_t(j, ox, oy, oz, dx, dy, dz)
                better = t < bst
                bst = jnp.where(better, t, bst)
                bsi = jnp.where(better, jnp.full((8, 128), j, jnp.int32), bsi)

            is_s = bst < bt  # strict: triangles win ties (core/intersect.py)
            bt_comb = jnp.where(is_s, bst, bt)
            hit = bt_comb < big

            # ---- winner attribute fetch (per-lane gather as masked scan),
            # windowed to the tile's [min, max] winner index: winners of
            # 1024 coherent rays cluster into a narrow range, so the O(N)
            # scan usually collapses to a few dozen iterations (exact
            # same result — indices outside the window match no lane).
            zero = jnp.zeros((8, 128), jnp.float32)
            bi_lo = jnp.min(jnp.where(bi >= 0, bi, _FETCH_HUGE))
            bi_hi = jnp.max(bi) + 1  # NO_HIT = -1 never exceeds real ids

            def fetch_geom(i, carry):
                m = bi == i
                base = i * _SHAD_W

                def sel(k, cur):
                    return jnp.where(m, shad_ref[0, base + k], cur)

                return tuple(sel(k, carry[k]) for k in range(19))

            g = jax.lax.fori_loop(bi_lo, bi_hi, fetch_geom, (zero,) * 19)
            v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = g[0:9]
            n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z = g[9:18]
            has_n = g[18]

            def fetch_mat(i, carry):
                m = bi == i
                base = i * _SHAD_W + 19

                def sel(k, cur):
                    return jnp.where(m, shad_ref[0, base + k], cur)

                return tuple(sel(k, carry[k]) for k in range(13))

            mt_ = jax.lax.fori_loop(bi_lo, bi_hi, fetch_mat, (zero,) * 13)
            (kax, kay, kaz, kdx, kdy, kdz, ksx, ksy, ksz,
             kex, key_, kez, ns) = mt_

            # ---- t/u/v recompute: classic MT form, as closest_hit does ------
            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok_det = jnp.abs(det) >= epsf
            inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u_r = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v_r = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t_r = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            ok_r = (ok_det & (u_r >= epsf) & (u_r <= 1.0) & (v_r >= epsf)
                    & (u_r + v_r <= 1.0) & (t_r >= epsf))
            t_r = jnp.where(ok_r, t_r, big)
            t_tri = jnp.where(t_r < big, t_r, bt_comb)  # borderline fallback
            t_fin = jnp.where(is_s, bst, t_tri)

            # ---- hit point + shading normal (surface_attributes) ------------
            t_safe = jnp.where(hit, t_fin, 1.0)
            back = t_safe - sh_eps
            hpx = jnp.where(hit, ox + dx * back, 0.0)
            hpy = jnp.where(hit, oy + dy * back, 0.0)
            hpz = jnp.where(hit, oz + dz * back, 0.0)

            ngx = e1y * e2z - e1z * e2y
            ngy = e1z * e2x - e1x * e2z
            ngz = e1x * e2y - e1y * e2x
            gn = jax.lax.rsqrt(jnp.maximum(ngx * ngx + ngy * ngy + ngz * ngz,
                                           tiny))
            ngx, ngy, ngz = ngx * gn, ngy * gn, ngz * gn
            u_sh = jnp.where(hit & ~is_s, u_r, 0.0)
            v_sh = jnp.where(hit & ~is_s, v_r, 0.0)
            w_sh = 1.0 - u_sh - v_sh
            nsx = n1x * u_sh + n2x * v_sh + n0x * w_sh
            nsy = n1y * u_sh + n2y * v_sh + n0y * w_sh
            nsz = n1z * u_sh + n2z * v_sh + n0z * w_sh
            sn = jax.lax.rsqrt(jnp.maximum(nsx * nsx + nsy * nsy + nsz * nsz,
                                           tiny))
            smooth = has_n > 0.5
            ntx = jnp.where(smooth, nsx * sn, ngx)
            nty = jnp.where(smooth, nsy * sn, ngy)
            ntz = jnp.where(smooth, nsz * sn, ngz)

            # Sphere winner: center/radius/material via a static masked scan.
            scx = zero
            scy = zero
            scz = zero
            srad = zero
            for j in range(S):
                m = bsi == j
                b0 = j * _SPH_W
                scx = jnp.where(m, sph_ref[0, b0 + 0], scx)
                scy = jnp.where(m, sph_ref[0, b0 + 1], scy)
                scz = jnp.where(m, sph_ref[0, b0 + 2], scz)
                srad = jnp.where(m, sph_ref[0, b0 + 3], srad)
                mm = m & is_s
                kax = jnp.where(mm, sph_ref[0, b0 + 5], kax)
                kay = jnp.where(mm, sph_ref[0, b0 + 6], kay)
                kaz = jnp.where(mm, sph_ref[0, b0 + 7], kaz)
                kdx = jnp.where(mm, sph_ref[0, b0 + 8], kdx)
                kdy = jnp.where(mm, sph_ref[0, b0 + 9], kdy)
                kdz = jnp.where(mm, sph_ref[0, b0 + 10], kdz)
                ksx = jnp.where(mm, sph_ref[0, b0 + 11], ksx)
                ksy = jnp.where(mm, sph_ref[0, b0 + 12], ksy)
                ksz = jnp.where(mm, sph_ref[0, b0 + 13], ksz)
                kex = jnp.where(mm, sph_ref[0, b0 + 14], kex)
                key_ = jnp.where(mm, sph_ref[0, b0 + 15], key_)
                kez = jnp.where(mm, sph_ref[0, b0 + 16], kez)
                ns = jnp.where(mm, sph_ref[0, b0 + 17], ns)

            r_safe = jnp.where(is_s, jnp.maximum(srad, 1e-6), 1.0)
            inv_r = 1.0 / r_safe
            nspx = jnp.where(is_s, hpx - scx, 0.0) * inv_r
            nspy = jnp.where(is_s, hpy - scy, 0.0) * inv_r
            nspz = jnp.where(is_s, hpz - scz, 0.0) * inv_r
            nx_ = jnp.where(hit, jnp.where(is_s, nspx, ntx), 0.0)
            ny_ = jnp.where(hit, jnp.where(is_s, nspy, nty), 0.0)
            nz_ = jnp.where(hit, jnp.where(is_s, nspz, ntz), 0.0)

            # ---- per-light: sample, shadow, Phong (static unroll over L) ----
            lcol_r = zero
            lcol_g = zero
            lcol_b = zero
            for l in range(L):
                cnt = cnt_ref[l]
                u_face = uniform(h0, np.uint32(_stream_const(4 * (b * 1024 + l))))
                r1 = uniform(h0, np.uint32(_stream_const(4 * (b * 1024 + l) + 1)))
                r2 = uniform(h0, np.uint32(_stream_const(4 * (b * 1024 + l) + 2)))
                cntf = cnt.astype(jnp.float32)
                face = jnp.minimum((u_face * cntf).astype(jnp.int32), cnt - 1)
                lv = [zero] * 9
                for f in range(F):
                    m = face == f
                    b0 = (l * F + f) * 9
                    for k in range(9):
                        lv[k] = jnp.where(m, lc_ref[0, b0 + k], lv[k])
                lpx = lv[0] + (lv[3] - lv[0]) * r1 + (lv[6] - lv[0]) * r2
                lpy = lv[1] + (lv[4] - lv[1]) * r1 + (lv[7] - lv[1]) * r2
                lpz = lv[2] + (lv[5] - lv[2]) * r1 + (lv[8] - lv[2]) * r2

                lvx, lvy, lvz = lpx - hpx, lpy - hpy, lpz - hpz
                dist = jnp.sqrt(jnp.maximum(lvx * lvx + lvy * lvy + lvz * lvz,
                                            tiny))
                inv_d = 1.0 / dist
                ldx, ldy, ldz = lvx * inv_d, lvy * inv_d, lvz * inv_d
                t_lim = dist - sh_eps

                # Occlusion only matters where it can gate a contribution:
                # active & hit & facing the light (vis below). The masked
                # hull of those lanes' shadow segments culls the sweep;
                # lanes outside the mask keep whatever occ the kept chunks
                # produce, but vis gates them off identically either way.
                d_nl = nx_ * ldx + ny_ * ldy + nz_ * ldz
                smask = active & hit & (d_nl > 0.0)
                s_tmax = jnp.max(jnp.where(smask, t_lim, -fbig))
                cnt_s = chunk_cull(smask, hpx, hpy, hpz, ldx, ldy, ldz,
                                   tmax=s_tmax)

                def shadow(i, occ):
                    base = i * 13
                    snx = tcs_ref[0, base + 0]
                    sny = tcs_ref[0, base + 1]
                    snz = tcs_ref[0, base + 2]
                    nv0 = tcs_ref[0, base + 3]
                    wux = tcs_ref[0, base + 4]
                    wuy = tcs_ref[0, base + 5]
                    wuz = tcs_ref[0, base + 6]
                    bu = tcs_ref[0, base + 7]
                    wvx = tcs_ref[0, base + 8]
                    wvy = tcs_ref[0, base + 9]
                    wvz = tcs_ref[0, base + 10]
                    bv = tcs_ref[0, base + 11]
                    det = -(ldx * snx + ldy * sny + ldz * snz)
                    ok_det = jnp.abs(det) >= epsf
                    inv = 1.0 / jnp.where(ok_det, det, 1.0)
                    t = ((hpx * snx + hpy * sny + hpz * snz) - nv0) * inv
                    px = hpx + t * ldx
                    py = hpy + t * ldy
                    pz = hpz + t * ldz
                    u = wux * px + wuy * py + wuz * pz + bu
                    v = wvx * px + wvy * py + wvz * pz + bv
                    ok = (ok_det & (jnp.minimum(u, v) >= epsf)
                          & (u + v <= 1.0) & (t >= epsf) & (t < t_lim))
                    # int32 carry: Mosaic cannot legalize a fori_loop carrying
                    # a bool (i1) vector — same pattern as rt_tile._occl_tile_kernel.
                    return jnp.maximum(occ, jnp.where(ok, 1, 0))

                occ0 = jnp.zeros((8, 128), jnp.int32)
                if G == 1:
                    occ = jax.lax.fori_loop(0, cnt_s * n_tris, shadow, occ0)
                else:
                    def shadow_chunk(k, occ):
                        c0 = list_ref[0, k] * np.int32(FUSED_CHUNK)
                        hi = jnp.minimum(c0 + np.int32(FUSED_CHUNK), n_tris)
                        return jax.lax.fori_loop(c0, hi, shadow, occ)

                    occ = jax.lax.fori_loop(0, cnt_s, shadow_chunk, occ0)
                for j in range(S):
                    t = sphere_t(j, hpx, hpy, hpz, ldx, ldy, ldz)
                    occ = jnp.maximum(occ, jnp.where(t < t_lim, 1, 0))

                hvx = (nx_ + ldx) * 2.0
                hvy = (ny_ + ldy) * 2.0
                hvz = (nz_ + ldz) * 2.0
                hn = jax.lax.rsqrt(jnp.maximum(hvx * hvx + hvy * hvy + hvz * hvz,
                                               tiny))
                spec_dot = jnp.maximum((nx_ * hvx + ny_ * hvy + nz_ * hvz) * hn,
                                       0.0)
                spec = jnp.exp(ns * jnp.log(jnp.maximum(spec_dot, tiny)))
                vis = hit & (occ == 0) & (d_nl > 0.0)
                cr = (kax * 0.5 + kex + kdx * d_nl + ksx * spec) * inv_l
                cg = (kay * 0.5 + key_ + kdy * d_nl + ksy * spec) * inv_l
                cb = (kaz * 0.5 + kez + kdz * d_nl + ksz * spec) * inv_l
                lcol_r = lcol_r + jnp.where(vis, cr, 0.0)
                lcol_g = lcol_g + jnp.where(vis, cg, 0.0)
                lcol_b = lcol_b + jnp.where(vis, cb, 0.0)


            # ---- accumulate this bounce; prep the reflected wavefront ----
            # (trace_rays semantics, core/render.py:209-219)
            col_r = col_r + jnp.where(active, thr_r * lcol_r, 0.0)
            col_g = col_g + jnp.where(active, thr_g * lcol_g, 0.0)
            col_b = col_b + jnp.where(active, thr_b * lcol_b, 0.0)
            if b + 1 < depth:
                ks_max = jnp.maximum(jnp.maximum(ksx, ksy), ksz)
                active = active & hit & (ks_max > 0.0)
                thr_r = jnp.where(active, thr_r * ksx, 0.0)
                thr_g = jnp.where(active, thr_g * ksy, 0.0)
                thr_b = jnp.where(active, thr_b * ksz, 0.0)
                ddn = dx * nx_ + dy * ny_ + dz * nz_
                rx = dx - 2.0 * ddn * nx_
                ry = dy - 2.0 * ddn * ny_
                rz = dz - 2.0 * ddn * nz_
                rn = jax.lax.rsqrt(
                    jnp.maximum(rx * rx + ry * ry + rz * rz, tiny))
                ox = jnp.where(active, hpx, ox)
                oy = jnp.where(active, hpy, oy)
                oz = jnp.where(active, hpz, oz)
                dx = jnp.where(active, rx * rn, dx)
                dy = jnp.where(active, ry * rn, dy)
                dz = jnp.where(active, rz * rn, dz)

        out_ref[0, 0:8, :] = col_r
        out_ref[0, 8:16, :] = col_g
        out_ref[0, 16:24, :] = col_b

    return kernel


@partial(jax.jit, static_argnames=("S", "L", "F", "seed", "eps",
                                   "shadow_eps", "depth", "interpret"))
def _fused_call(o, d, ray_ids, tcs, shad, sph, lc, cab, counts, n_tris,
                S: int, L: int, F: int, seed: int, eps: float,
                shadow_eps: float, depth: int = 1, interpret: bool = False):
    r = o.shape[0]
    G = cab.shape[1] // 6
    pad = (-r) % RAYS_PER_STEP
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        ray_ids = jnp.concatenate([ray_ids, jnp.zeros((pad,), ray_ids.dtype)])
    rp = r + pad
    steps = rp // RAYS_PER_STEP

    comps = jnp.concatenate([o, d], axis=1)  # [rp, 6]
    rays = comps.T.reshape(6, steps, 8, 128).transpose(1, 0, 2, 3)
    rays = rays.reshape(steps, 48, 128)
    ids = ray_ids.astype(jnp.int32).reshape(steps, 8, 128)

    kernel = _make_kernel(S, L, F, seed, eps, shadow_eps, depth, G)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # n_tris, counts
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(tcs.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(shad.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(sph.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(lc.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(cab.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 48, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 24, 128), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1, G), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((steps, 24, 128), jnp.float32),
        interpret=interpret,
    )(n_tris, counts, tcs, shad, sph, lc, cab, rays, ids)
    color = out.reshape(steps, 3, 8, 128).transpose(1, 0, 2, 3)
    return color.reshape(3, rp).T[:r]


def fused_trace(o: jax.Array, d: jax.Array, scene: Scene,
                ray_ids: jax.Array, cfg) -> jax.Array:
    """One wavefront through the fused frame kernel -> colors [R, 3].

    Caller must check `fused_supported` first (static gate). Matches
    trace_rays(depth=1, light_mode="area") draw-for-draw.
    """
    tcs, shad, sph, lc, cab, counts, n_tris = fused_tables(scene)
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _fused_call(
        o, d, ray_ids, tcs, shad, sph, lc, cab, counts, n_tris,
        S=scene.spheres.capacity, L=scene.lights.num_lights,
        F=scene.lights.max_faces, seed=cfg.seed, eps=float(cfg.eps),
        shadow_eps=float(cfg.shadow_eps), depth=cfg.depth,
        interpret=interpret,
    )


def _fallback_cfg(scene: Scene, cfg):
    """The non-fused backend the differentiable path uses (render.py)."""
    return cfg.replace(
        backend="lane" if scene.triangles.capacity <= 4096 else "tile"
    )


def _bwd_cfg(scene: Scene, cfg, num_rays: int):
    """Backend for the VJP's backward re-derivation.

    Large deep wavefronts re-derive through chunked mxtile: measured
    on-chip for the mixed 1080p depth-4 config (round 5), fwd+bwd is
    650 ms vs the lane path's 984 (and unchunked mxtile OOMs HBM — the
    XLA backward's per-ray [R,1,3] temps pad 42x under T(8,128); a
    262k-ray chunk bounds them). Small or shallow wavefronts keep the
    lane/tile rule — chunking only adds rematerialization there.
    """
    if num_rays >= 1_000_000 and cfg.depth >= 2:
        return cfg.replace(backend="mxtile", ray_chunk=262_144)
    return _fallback_cfg(scene, cfg)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_trace_diff(o, d, scene, ray_ids, cfg):
    """`fused_trace` with gradients: the forward primal is the fused
    frame kernel; the VJP re-derives through the XLA shading path at the
    same draws (the fused kernel is draw-for-draw identical to the
    lane/tile backend, so the recomputed forward matches the primal).
    This lets backend="auto" route eligible scenes to the fused kernel
    without breaking `jax.grad` through `render`/`trace_rays`."""
    return fused_trace(o, d, scene, ray_ids, cfg)


def _fused_diff_fwd(o, d, scene, ray_ids, cfg):
    return fused_trace(o, d, scene, ray_ids, cfg), (o, d, scene, ray_ids)


def _fused_diff_bwd(cfg, res, ct):
    from esctp1raytracer_tpu.core.render import trace_rays

    o, d, scene, ray_ids = res
    fb = _bwd_cfg(scene, cfg, o.shape[0])
    _, vjp = jax.vjp(
        lambda oo, dd, sc: trace_rays(oo, dd, sc, ray_ids, fb), o, d, scene
    )
    do, dd, dscene = vjp(ct)
    # uint32 ray ids carry no tangent: the float0 cotangent is JAX's
    # required stand-in for integer primals.
    return do, dd, dscene, np.zeros(ray_ids.shape, jax.dtypes.float0)


fused_trace_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)

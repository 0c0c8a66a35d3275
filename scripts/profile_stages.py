"""On-chip stage breakdown of the flagship 1080p x 10.2k-tri forward.

Times each pipeline stage separately (device-side, warm executables) so
kernel optimization targets the real bottleneck:

  * primary closest-hit sweep (Pallas kernel incl. cull pre-pass)
  * shadow-ray sweep on the realistic (incoherent) shadow wavefront
  * differentiable recompute + shading glue (forward minus sweeps)
  * culling effectiveness (mean/max blocks per bundle vs total blocks)

Run on TPU: timeout 3000 python scripts/profile_stages.py
"""
import sys as _s
_s.exit("historical probe: the round-1 bundle kernel (hit_pallas) it measures was retired in round 5 (ROOFLINE.md); its cull utilities live in kernels/cull.py")
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.core.intersect import closest_hit
from esctp1raytracer_tpu.kernels.hit_pallas import (
    BLOCK, COHERENT, pallas_tri_search, tri_constants_blocked,
)
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

WIDTH, HEIGHT = 1920, 1080


def timed(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)  # warm (compile)
    out = fn(*args)
    jax.block_until_ready(out)  # warm (steady)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:34s} {dt*1e3:9.1f} ms", flush=True)
    return dt, outs[0]


def main():
    scene = scene_from_mesh([
        icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
        icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                       smooth=False),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ])
    cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                         aspect=WIDTH / HEIGHT)
    o, d = cam.ray_grid(WIDTH, HEIGHT)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    R = o.shape[0]
    print(f"rays={R} tris={scene.triangles.capacity}", flush=True)
    eps = jnp.float32(np.finfo(np.float32).eps)

    # --- culling effectiveness -------------------------------------------
    tc, aabbs, perm = tri_constants_blocked(scene.triangles)
    nb = tc.shape[1]

    @jax.jit
    def cull_stats(o, d):
        inv = 1.0 / d
        bmin = aabbs[0:3].T
        bmax = aabbs[3:6].T
        t0 = (bmin[None] - o[:, None]) * inv[:, None]
        t1 = (bmax[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        mask = (tn <= tf) & (tf >= 0.0)
        g = jnp.any(mask.reshape(-1, COHERENT, nb), axis=1)
        cnt = jnp.sum(g, axis=1)
        return jnp.mean(cnt.astype(jnp.float32)), jnp.max(cnt)

    m, mx = cull_stats(o, d)
    print(f"blocks: total={nb} mean_per_bundle={float(m):.2f} max={int(mx)}",
          flush=True)
    dt_cull, _ = timed("cull stats prepass (XLA)", cull_stats, o, d)

    # --- primary sweep ----------------------------------------------------
    search = jax.jit(lambda oo, dd: pallas_tri_search(oo, dd, scene.triangles, eps))
    dt_p, (t_best, idx_best) = timed("primary sweep (pallas)", search, o, d)
    print(f"  pairs/s = {R*scene.triangles.capacity/dt_p/1e9:.1f} G", flush=True)

    # --- realistic shadow wavefront --------------------------------------
    @jax.jit
    def shadow_rays(t_best):
        hit = t_best < 1e30
        t_safe = jnp.where(hit, t_best, 1.0)[:, None]
        hp = o + d * (t_safe - 1e-4)
        far = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
        org = jnp.where(hit[:, None], hp, far)
        p = jnp.asarray([0.0, 6.0, 2.0], jnp.float32)
        lv = p - org
        dist = jnp.sqrt(jnp.maximum(jnp.sum(lv * lv, -1), 1e-12))
        return org, lv / dist[:, None], dist - 1e-4

    so, sd, st = jax.block_until_ready(shadow_rays(t_best))
    m2, mx2 = cull_stats(so, sd)
    print(f"shadow blocks: mean={float(m2):.2f} max={int(mx2)}", flush=True)
    dt_s, _ = timed("shadow sweep (pallas)", search, so, sd)

    # --- closest_hit (sweep + differentiable recompute) -------------------
    ch = jax.jit(lambda oo, dd: closest_hit(oo, dd, scene, eps,
                                            tri_search=pallas_tri_search))
    dt_ch, _ = timed("closest_hit (sweep+recompute)", ch, o, d)

    # --- full forward, pallas & mxu, chunked & unchunked ------------------
    for backend, chunk in [("pallas", 262144), ("pallas", 0), ("mxu", 262144)]:
        cfg = RenderConfig(backend=backend, ray_chunk=chunk, block_size=512,
                           depth=1)
        f = jax.jit(lambda: jnp.sum(trace_rays(o, d, scene, ids, cfg)))
        dt_f, _ = timed(f"forward {backend} chunk={chunk}", f)
        print(f"  {R/dt_f/1e6:.2f} Mrays/s", flush=True)

    print("breakdown: primary %.0f + shadow %.0f = sweeps %.0f ms" %
          (dt_p * 1e3, dt_s * 1e3, (dt_p + dt_s) * 1e3), flush=True)


if __name__ == "__main__":
    main()

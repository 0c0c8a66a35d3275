"""On-chip probe: dedicated any-hit kernel vs closest-hit-compare shadows.

Usage: timeout 3000 python scripts/probe_occl.py
"""
import sys as _s
_s.exit("historical probe: the round-1 bundle kernel (hit_pallas) it measures was retired in round 5 (ROOFLINE.md); its cull utilities live in kernels/cull.py")
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
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
from esctp1raytracer_tpu.kernels.hit_pallas import pallas_occlusion, pallas_tri_search
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

WIDTH, HEIGHT = 1920, 1080


def timed(label, fn, *args, iters=3):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
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
    eps = jnp.float32(np.finfo(np.float32).eps)

    # shadow wavefront
    search = jax.jit(lambda oo, dd: pallas_tri_search(oo, dd, scene.triangles, eps))
    t_best, _ = jax.block_until_ready(search(o, d))
    hit = t_best < 1e30
    hp = o + d * (jnp.where(hit, t_best, 1.0)[:, None] - 1e-4)
    far = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
    org = jnp.where(hit[:, None], hp, far)
    p = jnp.asarray([0.0, 6.0, 2.0], jnp.float32)
    lv = p - org
    dist = jnp.sqrt(jnp.maximum(jnp.sum(lv * lv, -1), 1e-12))
    sd = lv / dist[:, None]
    tl = dist - 1e-4
    org, sd, tl = jax.block_until_ready((org, sd, tl))

    occ = jax.jit(lambda: pallas_occlusion(org, sd, tl, scene.triangles, eps))
    cmp_ = jax.jit(lambda: search(org, sd)[0] < tl)
    dt_o, a = timed("shadow: any-hit kernel", occ)
    dt_c, b = timed("shadow: closest-hit + compare", cmp_)
    agree = float(jnp.mean(a == b))
    print(f"  agreement {agree:.6f}  speedup {dt_c/dt_o:.2f}x", flush=True)

    cfg = RenderConfig(backend="pallas", ray_chunk=0, depth=1)
    params = float_params(scene)
    f = jax.jit(lambda ps: jnp.sum(
        trace_rays(o, d, merge_params(scene, ps), ids, cfg) ** 2))
    g = jax.jit(jax.grad(lambda ps: jnp.sum(
        trace_rays(o, d, merge_params(scene, ps), ids, cfg) ** 2)))
    dt_f, _ = timed("forward pallas (occl kernel wired)", f, params)
    dt_g, _ = timed("fwd+bwd pallas (occl kernel wired)", g, params)
    print(f"  fwd {R/dt_f/1e6:.2f} Mrays/s | fwd+bwd {R/dt_g/1e6:.2f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()

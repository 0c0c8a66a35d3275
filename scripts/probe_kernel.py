"""On-chip A/B probe for hit_pallas kernel variants (round-2 perf work).

Measures the rewritten reduction layout at COHERENT in {4, 8, 16} on the
flagship 1080p x 10.2k-tri workload, plus the shadow sweep with and
without t-limit block culling. One TPU process; compiles are cached.

Usage: timeout 3500 python scripts/probe_kernel.py
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

from esctp1raytracer_tpu import Camera
from esctp1raytracer_tpu.kernels import hit_pallas as hp
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
    print(f"{label:44s} {dt*1e3:9.1f} ms", flush=True)
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
    eps = jnp.float32(np.finfo(np.float32).eps)
    print(f"rays={o.shape[0]} tris={scene.triangles.capacity}", flush=True)

    ref_t = ref_i = None
    for coherent in (8, 4, 16):
        hp.COHERENT = coherent
        search = jax.jit(
            lambda oo, dd: hp.pallas_tri_search(oo, dd, scene.triangles, eps))
        dt, (t_best, i_best) = timed(f"primary sweep COHERENT={coherent}",
                                     search, o, d)
        if ref_t is None:
            ref_t, ref_i = np.asarray(t_best), np.asarray(i_best)
        else:
            agree = float(np.mean(np.asarray(i_best) == ref_i))
            print(f"  winner agreement vs C=8: {agree:.6f}", flush=True)

        # shadow wavefront from the C-variant's own hits
        hit = t_best < 1e30
        t_safe = jnp.where(hit, t_best, 1.0)[:, None]
        hpnt = o + d * (t_safe - 1e-4)
        far = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
        org = jnp.where(hit[:, None], hpnt, far)
        p = jnp.asarray([0.0, 6.0, 2.0], jnp.float32)
        lv = p - org
        dist = jnp.sqrt(jnp.maximum(jnp.sum(lv * lv, -1), 1e-12))
        sd = lv / dist[:, None]
        tl = dist - 1e-4
        org, sd, tl = jax.block_until_ready((org, sd, tl))
        timed(f"shadow sweep COHERENT={coherent} (no limit)", search, org, sd)
        search_tl = jax.jit(
            lambda oo, dd, lim: hp.pallas_tri_search(
                oo, dd, scene.triangles, eps, t_limit=lim))
        timed(f"shadow sweep COHERENT={coherent} (t-limit)",
              search_tl, org, sd, tl)
    hp.COHERENT = 8


if __name__ == "__main__":
    main()

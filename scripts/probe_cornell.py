"""On-chip Cornell glue breakdown: lane search vs full frame stages.

Usage: timeout 3000 python scripts/probe_cornell.py
"""
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

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box
from esctp1raytracer_tpu.core.intersect import EPS, closest_hit
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.core.shading import shade
from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

REPS = 16


def timed(label, fn, iters=3):
    jax.block_until_ready(fn())
    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters / REPS
    print(f"{label:44s} {dt*1e3:9.2f} ms/frame", flush=True)
    return dt


def main():
    scene = cornell_box()
    cam = Camera.look_at((0.0, 1.0, 2.0), (0.0, 1.0, 0.0), vfov=60.0,
                         aspect=1024 / 768)
    o, d = cam.ray_grid(1024, 768)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    eps = jnp.float32(EPS)

    def loop(body):
        @jax.jit
        def f():
            def it(i, acc):
                return acc + body(i)
            return jax.lax.fori_loop(0, REPS, it, 0.0)
        return f

    # 1. lane search alone (per frame = one sweep); the i-perturbation
    # keeps XLA from hoisting the call out of the loop.
    timed("lane search (1 sweep)", loop(
        lambda i: jnp.sum(jnp.minimum(lane_tri_search(
            o + i.astype(jnp.float32) * 1e-9, d, scene.triangles, eps)[0],
            jnp.float32(1e6)))))

    # 2. closest_hit (sweep + recompute + sphere merge)
    timed("closest_hit", loop(
        lambda i: jnp.sum(closest_hit(
            o + i.astype(jnp.float32) * 1e-9, d, scene, eps,
            tri_search=lane_tri_search).t)))

    # 3. full frame
    cfg = RenderConfig(backend="lane", ray_chunk=0, depth=1)
    timed("full frame (trace_rays)", loop(
        lambda i: jnp.sum(trace_rays(o, d, scene, ids + i.astype(jnp.uint32),
                                     cfg))))

    # 4. frame minus occlusion: shade with a constant-false occlusion
    def no_occl(oo, dd, tl):
        return jnp.zeros(oo.shape[:1], bool)

    @jax.jit
    def frame_no_occl():
        def it(i, acc):
            hit = closest_hit(o, d, scene, eps, tri_search=lane_tri_search)
            col, _, _, _ = shade(o, d, hit, scene, 0,
                                 ids + i.astype(jnp.uint32), no_occl)
            return acc + jnp.sum(col)
        return jax.lax.fori_loop(0, REPS, it, 0.0)

    timed("frame w/o occlusion sweep", lambda: frame_no_occl())


if __name__ == "__main__":
    main()

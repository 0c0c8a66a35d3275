"""On-chip probe: lane kernel on Cornell + 100k-soup with the bundle kernel.

Usage: timeout 3500 python scripts/probe_lane.py
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
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.scene.builders import random_scene


def timed(label, fn, *args, iters=3):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:42s} {dt*1e3:9.1f} ms", flush=True)
    return dt, outs[0]


def main():
    # --- Cornell with the lane kernel (vs mxu 79 ms, bundle 120 ms) -------
    cscene = cornell_box()
    ccam = Camera.look_at((0.0, 1.0, 2.0), (0.0, 1.0, 0.0), vfov=60.0,
                          aspect=1024 / 768)
    co, cd = ccam.ray_grid(1024, 768)
    co, cd = co.reshape(-1, 3), cd.reshape(-1, 3)
    cids = jnp.arange(co.shape[0], dtype=jnp.uint32)
    reps = 8
    sums = {}
    for backend in ("lane", "mxu"):
        ccfg = RenderConfig(backend=backend, ray_chunk=0, depth=1)

        @jax.jit
        def cf():
            def body(i, acc):
                c = trace_rays(co, cd, cscene, cids + i.astype(jnp.uint32), ccfg)
                return acc + jnp.sum(c)
            return jax.lax.fori_loop(0, reps, body, 0.0)

        dt, s = timed(f"cornell fwd x{reps} {backend}", cf)
        sums[backend] = float(s)
        print(f"  {dt/reps*1e3:.1f} ms/frame  {co.shape[0]*reps/dt/1e6:.2f} Mrays/s",
              flush=True)
    rel = abs(sums["lane"] - sums["mxu"]) / abs(sums["mxu"])
    print(f"lane-vs-mxu image-sum rel diff: {rel:.2e}", flush=True)

    # --- 100k soup 4K (config 5) with the culled bundle kernel ------------
    scene = random_scene(100_000)
    cam = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0, aspect=3840 / 2160)
    o, d = cam.ray_grid(3840, 2160)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    R = o.shape[0]
    slices = 4  # watchdog-safe host slices (2.07M rays each)
    o_s, d_s, ids_s = (a.reshape(slices, -1, *a.shape[1:]) for a in (o, d, ids))
    cfg = RenderConfig(backend="pallas", ray_chunk=0, depth=1)

    one = jax.jit(lambda oo, dd, ii: jnp.sum(
        trace_rays(oo, dd, scene, ii, cfg) ** 2))

    def fwd():
        return sum(one(o_s[s], d_s[s], ids_s[s]) for s in range(slices))

    dt, _ = timed("soup100k 4K forward (pallas, 4 slices)", fwd, iters=2)
    print(f"  {R/dt/1e6:.2f} Mrays/s forward", flush=True)

    from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params
    params = float_params(scene)
    bwd_one = jax.jit(jax.grad(lambda ps, oo, dd, ii: jnp.sum(
        trace_rays(oo, dd, merge_params(scene, ps), ii, cfg))))

    def bwd():
        gs = [bwd_one(params, o_s[s], d_s[s], ids_s[s]) for s in range(slices)]
        return jax.tree.map(lambda *x: sum(x), *gs)

    dt, _ = timed("soup100k 4K fwd+bwd (pallas, 4 slices)", bwd, iters=2)
    print(f"  {R/dt/1e6:.2f} Mrays/s fwd+bwd", flush=True)


if __name__ == "__main__":
    main()

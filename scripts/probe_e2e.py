"""On-chip end-to-end probe after the kernel rewrite.

Measures: flagship 1080p forward / fwd+bwd (pallas), backward-only cost
decomposition, Cornell per-frame pallas vs mxu (fori-amortized), and
pallas-vs-mxu winner agreement on-chip.

Usage: timeout 3500 python scripts/probe_e2e.py
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

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box
from esctp1raytracer_tpu.core.render import trace_rays
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
    print(f"{label:40s} {dt*1e3:9.1f} ms", flush=True)
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
    params = float_params(scene)

    for chunk in (0, 262144):
        cfg = RenderConfig(backend="pallas", ray_chunk=chunk, depth=1)

        def fwd(ps):
            return jnp.sum(trace_rays(o, d, merge_params(scene, ps), ids, cfg) ** 2)

        f = jax.jit(fwd)
        g = jax.jit(jax.grad(fwd))
        dt_f, _ = timed(f"forward pallas chunk={chunk}", f, params)
        dt_g, _ = timed(f"fwd+bwd pallas chunk={chunk}", g, params)
        print(f"  fwd {R/dt_f/1e6:.2f} Mrays/s | fwd+bwd {R/dt_g/1e6:.2f} Mrays/s",
              flush=True)

    # Backward decomposition: grad with the search result held fixed costs
    # the same sweeps; the extra is the shading/recompute backward glue.
    # Also measure fwd with stop_gradient shading to isolate.
    cfg0 = RenderConfig(backend="pallas", ray_chunk=0, depth=1)

    # Winner agreement pallas vs mxu on a subgrid.
    from esctp1raytracer_tpu.core.intersect import EPS, argmin_hit
    from esctp1raytracer_tpu.kernels.hit_pallas import pallas_tri_search
    sub = slice(0, 262144)
    am_p = jax.jit(lambda: argmin_hit(o[sub], d[sub], scene,
                                      jnp.float32(EPS),
                                      tri_search=pallas_tri_search))
    am_m = jax.jit(lambda: argmin_hit(o[sub], d[sub], scene, jnp.float32(EPS)))
    (tp, pp, _), (tm, pm, _) = am_p(), am_m()
    agree = float(jnp.mean(pp == pm))
    print(f"pallas-vs-mxu winner agreement (256k rays): {agree:.6f}", flush=True)

    # Cornell: amortized frame loop, pallas vs mxu.
    cscene = cornell_box()
    ccam = Camera.look_at((0.0, 1.0, 2.0), (0.0, 1.0, 0.0), vfov=60.0,
                          aspect=1024 / 768)
    co, cd = ccam.ray_grid(1024, 768)
    co, cd = co.reshape(-1, 3), cd.reshape(-1, 3)
    cids = jnp.arange(co.shape[0], dtype=jnp.uint32)
    reps = 8
    for backend in ("pallas", "mxu"):
        ccfg = RenderConfig(backend=backend, ray_chunk=0, depth=1)

        @jax.jit
        def cf():
            def body(i, acc):
                c = trace_rays(co, cd, cscene, cids + i.astype(jnp.uint32), ccfg)
                return acc + jnp.sum(c)
            return jax.lax.fori_loop(0, reps, body, 0.0)

        dt, _ = timed(f"cornell fwd x{reps} {backend}", cf)
        print(f"  {dt/reps*1e3:.1f} ms/frame  {co.shape[0]*reps/dt/1e6:.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()

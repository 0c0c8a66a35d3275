"""On-chip probe: fused frame kernel vs lane backend on Cornell 1024x768.

Device-side timings (block_until_ready on device arrays), warm
executables, amortized fori_loop variant matching bench.py's Cornell
measurement. One process, one chip (see memory: axon claims).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box
from esctp1raytracer_tpu.core.render import trace_rays

W, H = 1024, 768
REPS = 8


def main():
    scene = cornell_box()
    cam = Camera.look_at((0.0, 1.0, 2.0), (0.0, 1.0, 0.0), vfov=60.0,
                         aspect=W / H)
    o, d = cam.ray_grid(W, H)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    nrays = o.shape[0]

    for backend in ("lane", "fused"):
        cfg = RenderConfig(backend=backend, ray_chunk=0)

        @jax.jit
        def frame():
            return jnp.sum(trace_rays(o, d, scene, ids, cfg))

        @jax.jit
        def frames_amortized():
            def body(i, acc):
                c = trace_rays(o, d, scene, ids + i.astype(jnp.uint32), cfg)
                return acc + jnp.sum(c)
            return jax.lax.fori_loop(0, REPS, body, 0.0)

        t0 = time.time()
        v1 = frame().block_until_ready()
        print(f"{backend}: compile+first {time.time()-t0:.1f}s sum={v1:.4f}",
              flush=True)
        for _ in range(2):
            frame().block_until_ready()
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            r = frame()
        r.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{backend}: single-frame {dt*1e3:8.2f} ms "
              f"{nrays/dt/1e6:7.2f} Mrays/s", flush=True)

        frames_amortized().block_until_ready()
        t0 = time.time()
        for _ in range(3):
            r = frames_amortized()
        r.block_until_ready()
        dt = (time.time() - t0) / (3 * REPS)
        print(f"{backend}: amortized    {dt*1e3:8.2f} ms "
              f"{nrays/dt/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

"""On-chip probe: tile kernel vs bundle kernel on the flagship workload.

Primary closest-hit sweep + shadow any-hit sweep at 1080p x 10.2k tris,
plus end-to-end forward/backward via trace_rays. Device-side timings.
"""
import sys as _s
_s.exit("historical probe: the round-1 bundle kernel (hit_pallas) it measures was retired in round 5 (ROOFLINE.md); its cull utilities live in kernels/cull.py")
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

from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.intersect import EPS
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels.hit_pallas import (
    pallas_occlusion,
    pallas_tri_search,
)
from esctp1raytracer_tpu.kernels.rt_tile import tile_occlusion, tile_tri_search
from esctp1raytracer_tpu.scene.builders import (
    _area_light,
    _ground_plane,
    icosphere_mesh,
    scene_from_mesh,
)

W, H = 1920, 1080


def build():
    meshes = [
        icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
        icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                       smooth=False),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ]
    return scene_from_mesh(meshes)


def timeit(fn, iters=3):
    fn()  # warm
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    scene = build()
    cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                         aspect=W / H)
    o, d = cam.ray_grid(W, H)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    nrays = o.shape[0]
    tris = scene.triangles
    t_lim = jnp.full((nrays,), 4.0, jnp.float32)

    for name, search, occl in (
        ("bundle", pallas_tri_search, pallas_occlusion),
        ("tile", tile_tri_search, tile_occlusion),
    ):
        f_search = jax.jit(lambda s=search: s(o, d, tris, EPS)[0].sum())
        t0 = time.time()
        v = f_search().block_until_ready()
        print(f"{name}: search compile+first {time.time()-t0:.1f}s "
              f"sum={v:.2f}", flush=True)
        dt = timeit(f_search)
        print(f"{name}: primary sweep {dt*1e3:8.1f} ms "
              f"{nrays/dt/1e6:6.2f} Mrays/s", flush=True)

        f_occl = jax.jit(lambda oc=occl: oc(o, d, t_lim, tris, EPS).sum())
        t0 = time.time()
        v = f_occl().block_until_ready()
        print(f"{name}: occl compile+first {time.time()-t0:.1f}s "
              f"hits={v}", flush=True)
        dt = timeit(f_occl)
        print(f"{name}: shadow sweep  {dt*1e3:8.1f} ms "
              f"{nrays/dt/1e6:6.2f} Mrays/s", flush=True)

    # End-to-end forward via trace_rays for both backends.
    ids = jnp.arange(nrays, dtype=jnp.uint32)
    for backend in ("pallas", "tile"):
        cfg = RenderConfig(backend=backend, ray_chunk=0)

        @jax.jit
        def fwd():
            return jnp.sum(trace_rays(o, d, scene, ids, cfg))

        t0 = time.time()
        v = fwd().block_until_ready()
        print(f"{backend}: e2e compile+first {time.time()-t0:.1f}s "
              f"sum={v:.3f}", flush=True)
        dt = timeit(fwd)
        print(f"{backend}: e2e forward  {dt*1e3:8.1f} ms "
              f"{nrays/dt/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

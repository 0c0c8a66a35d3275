"""Cost of per-step scene prep when the scene is a jit INPUT.

bench.py (the optimizer-loop shape) pays clustering + packing + cull
pre-pass per step; with the scene closed over as a constant XLA folds
most of it. This isolates each piece with the scene as an argument.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels.rt_tile import tri_constants_sub, _prep
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

def timed(label, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return dt

scene = scene_from_mesh([
    icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
    icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0), smooth=False),
    _ground_plane(),
    _area_light(center=(0.0, 6.0, 2.0), half=1.5),
])
cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0, aspect=1920/1080)
o, d = cam.ray_grid(1920, 1080)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
cfg = RenderConfig(backend="tile", ray_chunk=0, block_size=512, depth=1)

f_const = jax.jit(lambda: jnp.sum(trace_rays(o, d, scene, ids, cfg) ** 2))
f_arg = jax.jit(lambda sc: jnp.sum(trace_rays(o, d, sc, ids, cfg) ** 2))
tab = jax.jit(lambda sc: tri_constants_sub(sc.triangles))
prep_arg = jax.jit(lambda sc: _prep(o, d, tri_constants_sub(sc.triangles)[1], None)[:3])

timed("forward, scene constant", f_const)
timed("forward, scene as arg", f_arg, scene)
timed("tables only (cluster+pack), scene arg", tab, scene)
timed("tables + primary cull pre-pass, scene arg", prep_arg, scene)

"""Why is bench.py 90 ms slower than identically-shaped probe programs?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

def timed(label, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    print(f"{label:40s} {(time.time()-t0)/iters*1e3:9.1f} ms", flush=True)

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
params = float_params(scene)

for backend in ("tile", "auto"):
    cfg = RenderConfig(backend=backend, ray_chunk=0, block_size=512, depth=1)
    f = jax.jit(lambda ps, c=cfg: jnp.sum(
        trace_rays(o, d, merge_params(scene, ps), ids, c) ** 2))
    timed(f"fwd merge_params backend={backend}", f, params)
    g = jax.jit(jax.grad(lambda ps, c=cfg: jnp.sum(
        trace_rays(o, d, merge_params(scene, ps), ids, c) ** 2)))
    timed(f"fwd+bwd merge_params backend={backend}", g, params)

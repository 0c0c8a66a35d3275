"""Decompose the flagship backward: params-chain vs ray-chain vs residuals.

A: grad wrt all scene float params (the bench's program)
B: grad wrt (o, d) only — no scatter-adds into primitive tables
Both forwards are identical, so A-B isolates the table-cotangent cost
(packed-gather VJP scatter-adds + material chains).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
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
    dt = (time.time() - t0) / iters
    print(f"{label:36s} {dt*1e3:9.1f} ms", flush=True)
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
params = float_params(scene)

def loss_p(ps):
    sc = merge_params(scene, ps)
    c = trace_rays(o, d, sc, ids, cfg)
    return jnp.sum(c * c)

def loss_od(oo, dd):
    c = trace_rays(oo, dd, scene, ids, cfg)
    return jnp.sum(c * c)

fwd = jax.jit(lambda: loss_p(params))
gA = jax.jit(jax.grad(loss_p))
gB = jax.jit(jax.grad(loss_od, argnums=(0, 1)))
t_f = timed("forward only", fwd)
t_a = timed("fwd+bwd wrt scene params (A)", gA, params)
t_b = timed("fwd+bwd wrt (o,d) only   (B)", gB, o, d)
print(f"bwd A = {1e3*(t_a-t_f):.0f} ms | bwd B = {1e3*(t_b-t_f):.0f} ms | "
      f"table-cotangent cost A-B = {1e3*(t_a-t_b):.0f} ms", flush=True)

"""Flagship: MXU tile kernel vs VPU tile kernel, on-chip."""
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
from esctp1raytracer_tpu.kernels.rt_tile import tile_tri_search, tile_occlusion
from esctp1raytracer_tpu.kernels.rt_mxu import mxu_tile_search, mxu_tile_occlusion
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

def timed(label, fn, *args, iters=4, batches=2):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:42s} {best*1e3:9.1f} ms", flush=True)
    return best, out

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
eps = jnp.float32(np.finfo(np.float32).eps)

s_tile = jax.jit(lambda: tile_tri_search(o, d, scene.triangles, eps))
s_mxu = jax.jit(lambda: mxu_tile_search(o, d, scene.triangles, eps))
_, (t1, p1) = timed("primary search tile", s_tile)
_, (t2, p2) = timed("primary search mxtile", s_mxu)
p1, p2 = np.asarray(p1), np.asarray(p2)
print(f"winner agreement: {(p1 == p2).mean():.6f}", flush=True)

for backend in ("tile", "mxtile"):
    cfg = RenderConfig(backend=backend, ray_chunk=0, block_size=512, depth=1)
    f = jax.jit(lambda c=cfg: jnp.sum(trace_rays(o, d, scene, ids, c)))
    timed(f"forward {backend}", f)

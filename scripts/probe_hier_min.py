"""Minimal on-chip repro: hier-mode tile search at cfg5 scale.

Scales up from small ray counts to the full quarter frame to find
whether the round-4 'hier' default faults on-chip (probe_hier.py hit
UNAVAILABLE on its first hier dispatch) and at what size.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera
from esctp1raytracer_tpu.kernels import rt_tile
from esctp1raytracer_tpu.kernels.rt_tile import tile_tri_search
from esctp1raytracer_tpu.scene import builders

EPS = jnp.float32(np.finfo(np.float32).eps)

sc = builders.random_scene(100_000)
cam = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0, aspect=3840 / 2160)
o, d = cam.ray_grid(3840, 2160)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)

rt_tile.CULL_MODE = "hier"
try:
    for n in (4096, 65536, 524288, o.shape[0] // 4):
        f = jax.jit(lambda oo, dd: tile_tri_search(oo, dd, sc.triangles,
                                                   EPS, coherent=True))
        t, p = f(o[:n], d[:n])
        jax.block_until_ready((t, p))
        print(f"hier n={n}: ok  hits={int((np.asarray(p) >= 0).sum())}",
              flush=True)
finally:
    rt_tile.CULL_MODE = None

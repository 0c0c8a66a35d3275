"""On-chip A/B: pre-hit t-ceiling culling (round-3 ROOFLINE lever).

Measures the flagship primary sweep + e2e forward with
rt_tile.PRIMARY_PREHIT off/on for both the VPU tile and MXU tile
kernels, checks winner identity, and times the XLA oversized pre-sweep
alone (its cost must be under the kernel-time saving for the flag to
default on).
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

import esctp1raytracer_tpu.kernels.rt_tile as rt_tile
from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels.rt_mxu import mxu_tile_search
from esctp1raytracer_tpu.kernels.rt_tile import tile_tri_search
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)


def timed(label, fn, *args, iters=4, batches=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:48s} {best*1e3:9.1f} ms", flush=True)
    return best, out


scene = scene_from_mesh([
    icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
    icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0), smooth=False),
    _ground_plane(),
    _area_light(center=(0.0, 6.0, 2.0), half=1.5),
])
W, H = (int(x) for x in os.environ.get("PROBE_SIZE", "1920x1080").split("x"))
cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0, aspect=W / H)
o, d = cam.ray_grid(W, H)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
eps = jnp.float32(np.finfo(np.float32).eps)
eps_arr = eps.reshape(1)

# Cost of the XLA pre-sweep alone (uncullable [R, OVER_CAP]).
_, _, _, ov_buf, _ = rt_tile.tri_constants_sub(scene.triangles)
pre = jax.jit(lambda: rt_tile._oversized_min_t(o, d, ov_buf, eps_arr))
_, t_ub = timed("oversized pre-sweep (XLA, alone)", pre)
ub = np.asarray(t_ub)
print(f"  pre-hit coverage: {(ub < rt_tile.BIG).mean()*100:.1f}% of rays "
      f"bounded, median t_ub {np.median(ub[ub < rt_tile.BIG]):.2f}",
      flush=True)

results = {}
for name, search in (("tile", tile_tri_search), ("mxtile", mxu_tile_search)):
    for flag in (False, True):
        rt_tile.PRIMARY_PREHIT = flag
        s = jax.jit(lambda search=search: search(o, d, scene.triangles, eps))
        _, (t, p) = timed(f"primary {name} prehit={flag}", s)
        results[(name, flag)] = np.asarray(p)
    same = (results[(name, False)] == results[(name, True)]).mean()
    print(f"  {name} winner agreement off/on: {same:.6f}", flush=True)

for backend in ("tile", "mxtile"):
    for flag in (False, True):
        rt_tile.PRIMARY_PREHIT = flag
        cfg = RenderConfig(backend=backend, ray_chunk=0, block_size=512,
                           depth=1)
        # fresh lambda per flag value -> fresh jit cache entry (the flag
        # is read at trace time, not part of any cache key).
        f = jax.jit(lambda c=cfg: jnp.sum(trace_rays(o, d, scene, ids, c)))
        timed(f"forward {backend} prehit={flag}", f)

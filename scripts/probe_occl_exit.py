"""A/B the any-hit early exit (nearest-first lists + while_loop).

Legs: cfg5 (4K x 100k) real-shadow occlusion + e2e quarter frame;
flagship (1080p x 10.2k) tile occlusion. Results asserted identical.
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
from esctp1raytracer_tpu.kernels import rt_tile
from esctp1raytracer_tpu.kernels.rt_tile import tile_occlusion, tile_tri_search
from esctp1raytracer_tpu.scene import builders

EPS = jnp.float32(np.finfo(np.float32).eps)


def timed(label, fn, *args, iters=2, batches=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:56s} {best*1e3:9.1f} ms", flush=True)
    return best, out


sc = builders.random_scene(100_000)
cam = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0, aspect=3840/2160)
o, d = cam.ray_grid(3840, 2160)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
q = o.shape[0] // 4
o1, d1 = jax.block_until_ready(o[:q]), d[:q]
ids1 = jnp.arange(q, dtype=jnp.uint32)
cfg = RenderConfig(backend="tile", ray_chunk=0, depth=1)

t1, p1 = jax.block_until_ready(jax.jit(
    lambda: tile_tri_search(o1, d1, sc.triangles, EPS))())
hp = (np.asarray(o1) + np.asarray(d1)
      * (np.asarray(t1)[:, None] - 1e-4)).astype(np.float32)
lp = np.array([0.0, 30.0, 0.0], np.float32)
sd = lp[None] - hp
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sd = (sd / np.maximum(dist, 1e-9)).astype(np.float32)
tl = np.where(np.asarray(p1) >= 0, dist[:, 0] - 1e-3, -1.0).astype(np.float32)
so, sdir, stl = jnp.asarray(hp), jnp.asarray(sd), jnp.asarray(tl)

fl = builders.scene_from_mesh([
    builders.icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
    builders.icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                            smooth=False),
    builders._ground_plane(),
    builders._area_light(center=(0.0, 6.0, 2.0), half=1.5),
])
fcam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                      aspect=1920 / 1080)
fo, fd = fcam.ray_grid(1920, 1080)
fo, fd = fo.reshape(-1, 3), fd.reshape(-1, 3)
ft, fp = jax.block_until_ready(jax.jit(
    lambda: tile_tri_search(fo, fd, fl.triangles, EPS))())
fhp = (np.asarray(fo) + np.asarray(fd)
       * (np.asarray(ft)[:, None] - 1e-4)).astype(np.float32)
flp = np.array([0.0, 6.0, 2.0], np.float32)
fsd = flp[None] - fhp
fdist = np.linalg.norm(fsd, axis=1, keepdims=True)
fsd = (fsd / np.maximum(fdist, 1e-9)).astype(np.float32)
ftl = np.where(np.asarray(fp) >= 0, fdist[:, 0] - 1e-3, -1.0
               ).astype(np.float32)
fso, fsdir, fstl = jnp.asarray(fhp), jnp.asarray(fsd), jnp.asarray(ftl)

import sys
ES = tuple(int(x) for x in sys.argv[1:]) or (0, 8, 16)
res = {}
try:
    for early in ES:
        rt_tile.OCCL_EARLY_EXIT = early
        tag = f"E={early}" if early else "fori"
        occ5 = jax.jit(lambda: tile_occlusion(so, sdir, stl, sc.triangles,
                                              EPS))
        _, o5 = timed(f"[{tag}] cfg5 occlusion real shadows", occ5)
        occf = jax.jit(lambda: tile_occlusion(fso, fsdir, fstl, fl.triangles,
                                              EPS))
        _, of_ = timed(f"[{tag}] flagship occlusion (tile)", occf)
        e2e = jax.jit(lambda: jnp.sum(trace_rays(o1, d1, sc, ids1, cfg) ** 2))
        _, img = timed(f"[{tag}] cfg5 e2e (1/4 frame)", e2e)
        res[tag] = (np.asarray(o5), np.asarray(of_), float(img))
finally:
    rt_tile.OCCL_EARLY_EXIT = 8

ref = res.get("fori")
for tag, b in res.items():
    if ref is None or tag == "fori":
        continue
    print(f"[{tag}] agreement: cfg5 {(ref[0] == b[0]).mean():.6f} "
          f"flagship {(ref[1] == b[1]).mean():.6f} "
          f"img d {abs(ref[2] - b[2]):.3e}", flush=True)
    assert (ref[0] == b[0]).all() and (ref[1] == b[1]).all()
print("OK: all variants answer-identical", flush=True)

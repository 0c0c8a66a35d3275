"""Isolate the cfg5 e2e regression under the auto cull mode.

probe_cullmode r4: standalone interval primary sweep is FASTER (226 vs
256 ms/quarter) yet the auto e2e is 1.6x SLOWER (4.3 vs 2.7 s). The
in-pipeline search differs from the standalone leg only by the
SPHERE_PREHIT t-ceiling hint (BIG for this sphere-free scene) and by
running inside the full traced frame. Time each stage under both modes.
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
from esctp1raytracer_tpu.core.intersect import BIG
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels import rt_mxu, rt_tile
from esctp1raytracer_tpu.kernels.rt_tile import tile_occlusion, tile_tri_search
from esctp1raytracer_tpu.scene import builders

EPS = jnp.float32(np.finfo(np.float32).eps)


def timed(label, fn, *args, iters=2, batches=2):
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

for mode in ("argsort", None):
    rt_tile.CULL_MODE = mode
    rt_mxu.CULL_MODE = mode
    tag = mode or "auto"
    s_none = jax.jit(lambda oo, dd: tile_tri_search(oo, dd, sc.triangles,
                                                    EPS, coherent=True))
    timed(f"[{tag}] search t_limit=None coherent", s_none, o1, d1)
    tlim = jnp.full((q,), BIG, jnp.float32)
    s_big = jax.jit(lambda oo, dd, tl: tile_tri_search(
        oo, dd, sc.triangles, EPS, t_limit=tl, coherent=True))
    timed(f"[{tag}] search t_limit=BIG coherent", s_big, o1, d1, tlim)
    # real shadow wavefront occlusion
    t1, p1 = jax.block_until_ready(s_none(o1, d1))
    hp = (np.asarray(o1) + np.asarray(d1)
          * (np.asarray(t1)[:, None] - 1e-4)).astype(np.float32)
    lp = np.array([0.0, 30.0, 0.0], np.float32)
    sd = lp[None] - hp
    dist = np.linalg.norm(sd, axis=1, keepdims=True)
    sd = (sd / np.maximum(dist, 1e-9)).astype(np.float32)
    tl = np.where(np.asarray(p1) >= 0, dist[:, 0] - 1e-3, -1.0
                  ).astype(np.float32)
    so, sdir, stl = jnp.asarray(hp), jnp.asarray(sd), jnp.asarray(tl)
    occ = jax.jit(lambda: tile_occlusion(so, sdir, stl, sc.triangles, EPS))
    timed(f"[{tag}] occlusion real shadow wavefront", occ)
    e2e = jax.jit(lambda oo, dd, ii: jnp.sum(
        trace_rays(oo, dd, sc, ii, cfg) ** 2))
    timed(f"[{tag}] trace_rays e2e (1/4 frame)", e2e, o1, d1, ids1)
rt_tile.CULL_MODE = None
rt_mxu.CULL_MODE = None

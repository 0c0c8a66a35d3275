"""Config 5 (100k tris, 4K, 1/4 slice) stage breakdown: pre-pass vs sweep."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera
from esctp1raytracer_tpu.kernels import rt_tile
from esctp1raytracer_tpu.scene import builders

def timed(label, fn, *args, iters=2, batches=2):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:46s} {best*1e3:9.1f} ms", flush=True)
    return best, out

scene = builders.random_scene(100_000)
cam = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0, aspect=3840/2160)
o, d = cam.ray_grid(3840, 2160)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
eps = jnp.float32(np.finfo(np.float32).eps)
S = o.shape[0] // 4
o1, d1 = jax.block_until_ready(o[:S]), d[:S]
print(f"slice rays {S}, capacity {scene.triangles.capacity}", flush=True)

tc, aabbs, perm, _, _ = rt_tile.tri_constants_sub(scene.triangles)
print(f"nsub {aabbs.shape[1]}", flush=True)

prep = jax.jit(lambda oo, dd: rt_tile._prep(oo, dd, aabbs, None))
_, (rays, ids, cnt, *_ ) = timed("cull pre-pass alone (1/4 frame)", prep, o1, d1)
cn = np.asarray(cnt)
print(f"mean culled list len {cn.mean():.1f} of {aabbs.shape[1]} "
      f"(p50 {np.percentile(cn,50):.0f}, p95 {np.percentile(cn,95):.0f})", flush=True)

s = jax.jit(lambda oo, dd: rt_tile.tile_tri_search(oo, dd, scene.triangles, eps))
timed("tile search full (1/4 frame)", s, o1, d1)

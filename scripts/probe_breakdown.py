"""On-chip stage breakdown of the flagship forward on the TILE backend.

Separates: cull pre-pass (XLA), primary tile sweep (kernel only),
occlusion pre-pass+kernel, closest_hit recompute, shading glue, and the
full forward/backward — so the next optimization targets the real cost.
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
from esctp1raytracer_tpu.core.intersect import closest_hit
from esctp1raytracer_tpu.kernels import rt_tile
from esctp1raytracer_tpu.kernels.rt_tile import (
    tile_tri_search, tile_occlusion, tri_constants_sub, _prep, _tile_search,
)
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

WIDTH, HEIGHT = 1920, 1080

def timed(label, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.1f} ms", flush=True)
    return dt, outs[0]

def main():
    scene = scene_from_mesh([
        icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
        icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                       smooth=False),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ])
    cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                         aspect=WIDTH / HEIGHT)
    o, d = cam.ray_grid(WIDTH, HEIGHT)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    R = o.shape[0]
    N = scene.triangles.capacity
    print(f"rays={R} tris={N} nsub={N//128}", flush=True)
    eps = jnp.float32(np.finfo(np.float32).eps)
    eps_arr = eps.reshape(1) if hasattr(eps, 'reshape') else jnp.asarray([eps])

    tc, aabbs, perm, _, _ = tri_constants_sub(scene.triangles)

    # cull pre-pass alone
    prep = jax.jit(lambda oo, dd: _prep(oo, dd, aabbs, None)[:3])
    dt_prep, (rays_p, ids_p, cnt_p) = timed("cull pre-pass (XLA, primary)", prep, o, d)
    cnt_np = np.asarray(cnt_p).ravel()
    print(f"  mean blocks/bundle={cnt_np.mean():.2f} max={cnt_np.max()}", flush=True)

    # full tile search (prep + kernel)
    search = jax.jit(lambda oo, dd: tile_tri_search(oo, dd, scene.triangles, eps))
    dt_p, (t_best, idx_best) = timed("primary tile search (prep+kernel)", search, o, d)

    # shadow wavefront
    @jax.jit
    def shadow_rays(t_best):
        hit = t_best < 1e30
        t_safe = jnp.where(hit, t_best, 1.0)[:, None]
        hp = o + d * (t_safe - 1e-4)
        far = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
        org = jnp.where(hit[:, None], hp, far)
        p = jnp.asarray([0.0, 6.0, 2.0], jnp.float32)
        lv = p - org
        dist = jnp.sqrt(jnp.maximum(jnp.sum(lv * lv, -1), 1e-12))
        return org, lv / dist[:, None], dist - 1e-4
    so, sd, st = jax.block_until_ready(shadow_rays(t_best))
    occl = jax.jit(lambda oo, dd, tl: tile_occlusion(oo, dd, tl, scene.triangles, eps))
    dt_o, _ = timed("occlusion tile (prep+kernel)", occl, so, sd, st)

    # closest_hit = search + differentiable recompute
    ch = jax.jit(lambda oo, dd: closest_hit(oo, dd, scene, eps,
                                            tri_search=tile_tri_search))
    dt_ch, _ = timed("closest_hit (search+recompute)", ch, o, d)

    cfg = RenderConfig(backend="tile", ray_chunk=0, block_size=512, depth=1)
    fwd = jax.jit(lambda: jnp.sum(trace_rays(o, d, scene, ids, cfg)))
    dt_f, _ = timed("forward tile (full)", fwd)
    print(f"  {R/dt_f/1e6:.2f} Mrays/s", flush=True)

    dt_fb = dt_f
    if os.environ.get("PROBE_BWD"):  # grad compile is 100-500s cold
        from esctp1raytracer_tpu.parallel.sharding import (
            float_params, merge_params,
        )
        params = float_params(scene)
        def loss_fn(ps):
            sc = merge_params(scene, ps)
            c = trace_rays(o, d, sc, ids, cfg)
            return jnp.sum(c * c)
        fb = jax.jit(jax.grad(loss_fn))
        dt_fb, _ = timed("fwd+bwd tile (full)", fb, params, iters=3)
        print(f"  {R/dt_fb/1e6:.2f} Mrays/s", flush=True)

    glue = dt_f - dt_ch - dt_o
    print(f"breakdown: prep {dt_prep*1e3:.0f} | primary {dt_p*1e3:.0f} "
          f"(kernel {1e3*(dt_p-dt_prep):.0f}) | occl {dt_o*1e3:.0f} | "
          f"recompute {1e3*(dt_ch-dt_p):.0f} | glue {glue*1e3:.0f} | "
          f"bwd {1e3*(dt_fb-dt_f):.0f} ms", flush=True)

if __name__ == "__main__":
    main()

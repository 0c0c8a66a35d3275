"""On-chip A/B of the MXU tile kernel's ray-group size (matmul M dim).

Each M-ray group sweeps the UNION of its rays' candidate 128-triangle
blocks, so the group size trades per-step VPU-epilogue + matmul cost
against list tightness: smaller groups test fewer pairs but run more
grid steps (and a wider cull pre-pass). The VPU tile kernel's per-8-ray
lists on the flagship average 4.77 blocks; the question is how much of
the M=128 union is waste, and where the step-overhead crossover sits.

Legs per M in {32, 64, 128, 256}:
  - cull stats: mean/max group-list length (pairs tested = sum(cnt)*M*128)
  - primary closest-hit sweep (warm, pipelined batch best)
  - shadow any-hit sweep on the real shadow wavefront
  - e2e forward (trace_rays, backend="mxtile")
The 128 leg always runs first (it is the agreement reference); every
other leg asserts exact primary/occlusion winner agreement vs M=128.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
MS = tuple(int(x) for x in sys.argv[1:]) or (128, 64, 32, 256)
# The m=128 leg is the agreement reference: run it first unconditionally.
MS = (128,) + tuple(m for m in MS if m != 128)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.intersect import closest_hit
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.core.shading import sample_lights, surface_attributes
import esctp1raytracer_tpu.kernels.rt_mxu as rt_mxu
from esctp1raytracer_tpu.kernels.rt_mxu import (
    _prep_mxu, _segments, mxu_tile_occlusion, mxu_tile_search,
)
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)


def timed(label, fn, iters=4, batches=3):
    out = fn(); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn() for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"  {label:38s} {best*1e3:9.1f} ms", flush=True)
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

# Real shadow wavefront: primary winners -> surface points -> light samples
# (mirrors core/shading.shade's occlusion prologue). One jitted function:
# eager op-by-op dispatch over the axon tunnel is minutes-slow.
@jax.jit
def _shadow_wavefront():
    hit, trow = closest_hit(o, d, scene, eps, tri_search=mxu_tile_search,
                            with_row=True)
    hit_p, normal, _ = surface_attributes(o, d, hit, scene, 1e-4, trow=trow)
    p_light, _, _ = sample_lights(scene, 0, ids, 0, "area")
    l_vec = p_light - hit_p[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(l_vec * l_vec, axis=-1), 1e-12))
    l_dir = l_vec / dist[..., None]
    d_nl = jnp.sum(normal[:, None, :] * l_dir, axis=-1)
    t_limit = jnp.where(d_nl > 0.0, dist - 1e-4, -1.0)
    far = jnp.asarray([3e7, 3e7, 3e7], hit_p.dtype)
    so = jnp.where(hit.hit[:, None], hit_p, far)
    so = jnp.broadcast_to(so[:, None, :], l_vec.shape)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    return flat(so), flat(l_dir), flat(t_limit)


so, sd, stl = map(jax.block_until_ready, _shadow_wavefront())
print(f"shadow wavefront: {so.shape[0]} rays", flush=True)

# Cull stats per M (primary wavefront, first/only segment).
for m in sorted(MS):
    @jax.jit
    def _stats(m=m):
        segs, _, _ = _segments(scene.triangles, exclude_oversized=False)
        tfq, aabbs, _ = next(segs)
        _, _, cnt, _, _, _ = _prep_mxu(o, d, aabbs, None, m)
        return cnt
    c = np.asarray(_stats()).ravel()
    pairs = c.sum() * m * 128
    print(f"M={m:3d}: groups={c.size:6d} mean cnt={c.mean():6.2f} "
          f"p95={np.percentile(c, 95):5.0f} max={c.max():4d} "
          f"pairs={pairs/1e9:6.2f}G", flush=True)

ref = {}
try:
    for m in MS:
        rt_mxu.RAY_TILE = m
        print(f"--- M = {m}", flush=True)
        s = jax.jit(lambda m=m: mxu_tile_search(o, d, scene.triangles, eps))
        _, (t_m, p_m) = timed(f"primary search M={m}", s)
        q = jax.jit(lambda m=m: mxu_tile_occlusion(so, sd, stl,
                                                   scene.triangles, eps))
        _, occ_m = timed(f"shadow any-hit M={m}", q)
        cfg = RenderConfig(backend="mxtile", ray_chunk=0, block_size=512,
                           depth=1)
        f = jax.jit(lambda m=m, c=cfg: jnp.sum(trace_rays(o, d, scene, ids, c)))
        _, img_m = timed(f"forward e2e M={m}", f)
        if m == 128:
            ref = dict(p=np.asarray(p_m), occ=np.asarray(occ_m),
                       img=float(img_m))
        else:
            pa = (np.asarray(p_m) == ref["p"]).mean()
            oa = (np.asarray(occ_m) == ref["occ"]).mean()
            print(f"  winner agreement vs M=128: primary {pa:.6f} "
                  f"occl {oa:.6f} "
                  f"img sum d={abs(float(img_m)-ref['img']):.3e}",
                  flush=True)
            assert pa == 1.0 and oa == 1.0, (
                f"M={m} disagrees with the M=128 reference "
                f"(primary {pa}, occl {oa})")
finally:
    # The sweep mutates the module global; restore even on mid-sweep
    # failure so anything else in the process sees the default.
    rt_mxu.RAY_TILE = 128

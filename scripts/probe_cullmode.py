"""A/B the pre-pass CULL_MODE (interval+extract vs per-ray+argsort).

Legs (all on-chip, warm, best pipelined batch):
  - cfg5 (4K x 100k, tile): full forward e2e + primary search
  - flagship (1080p x 10.2k, mxtile): primary search, shadow any-hit,
    forward e2e
Winner/occlusion agreement between the two modes is asserted exact on
every leg (the interval mask is conservative: extra blocks re-test
triangles that lose; lists stay ascending so first-wins ties hold).
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
from esctp1raytracer_tpu.kernels import rt_mxu, rt_tile
from esctp1raytracer_tpu.kernels.rt_mxu import mxu_tile_occlusion, mxu_tile_search
from esctp1raytracer_tpu.kernels.rt_tile import tile_tri_search
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
    print(f"{label:52s} {best*1e3:9.1f} ms", flush=True)
    return best, out


def set_mode(mode):
    rt_tile.CULL_MODE = mode
    rt_mxu.CULL_MODE = mode


def run_legs(tag):
    out = {}
    # cfg5: tile backend
    sc5 = builders.random_scene(100_000)
    cam5 = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0,
                          aspect=3840 / 2160)
    o5, d5 = cam5.ray_grid(3840, 2160)
    o5, d5 = o5.reshape(-1, 3), d5.reshape(-1, 3)
    q = o5.shape[0] // 4
    s5 = jax.jit(lambda oo, dd: tile_tri_search(oo, dd, sc5.triangles, EPS,
                                                coherent=True))
    _, (t5, p5) = timed(f"[{tag}] cfg5 primary tile search (1/4)", s5,
                        o5[:q], d5[:q])
    out["cfg5_p"] = np.asarray(p5)
    ids5 = jnp.arange(o5.shape[0], dtype=jnp.uint32)
    cfg = RenderConfig(backend="tile", ray_chunk=0, depth=1)
    # full-frame forward, host-level halves (known-good ray cap)
    h = o5.shape[0] // 4
    f5 = jax.jit(lambda oo, dd, ii: jnp.sum(
        trace_rays(oo, dd, sc5, ii, cfg) ** 2))

    def frame():
        return sum(f5(o5[k * h:(k + 1) * h], d5[k * h:(k + 1) * h],
                      ids5[k * h:(k + 1) * h]) for k in range(4))

    _, img5 = timed(f"[{tag}] cfg5 forward e2e (full 4K)", frame)
    out["cfg5_img"] = float(img5)

    # flagship: mxtile backend
    fl = builders.scene_from_mesh([
        builders.icosphere_mesh(subdivisions=4, radius=1.0,
                                center=(-1.3, 1.0, 0.0)),
        builders.icosphere_mesh(subdivisions=4, radius=1.0,
                                center=(1.3, 1.0, 0.0), smooth=False),
        builders._ground_plane(),
        builders._area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ])
    fcam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                          aspect=1920 / 1080)
    fo, fd = fcam.ray_grid(1920, 1080)
    fo, fd = fo.reshape(-1, 3), fd.reshape(-1, 3)
    sf = jax.jit(lambda: mxu_tile_search(fo, fd, fl.triangles, EPS,
                                         coherent=True))
    _, (tf_, pf) = timed(f"[{tag}] flagship primary mxtile search", sf)
    out["fl_p"] = np.asarray(pf)
    # shadow wavefront: hit points toward the area light center
    hitm = np.asarray(pf) >= 0
    tt = np.asarray(tf_)
    hp = (np.asarray(fo) + np.asarray(fd) * (tt[:, None] - 1e-4)).astype(np.float32)
    lp = np.array([0.0, 6.0, 2.0], np.float32)
    sd = lp[None] - hp
    dist = np.linalg.norm(sd, axis=1, keepdims=True)
    sd = (sd / np.maximum(dist, 1e-9)).astype(np.float32)
    tl = np.where(hitm, dist[:, 0] - 1e-3, -1.0).astype(np.float32)
    so, sdir, stl = jnp.asarray(hp), jnp.asarray(sd), jnp.asarray(tl)
    qf = jax.jit(lambda: mxu_tile_occlusion(so, sdir, stl, fl.triangles, EPS))
    _, occf = timed(f"[{tag}] flagship shadow mxtile any-hit", qf)
    out["fl_occ"] = np.asarray(occf)
    fids = jnp.arange(fo.shape[0], dtype=jnp.uint32)
    fcfg = RenderConfig(backend="mxtile", ray_chunk=0, block_size=512,
                        depth=1)
    ff = jax.jit(lambda: jnp.sum(trace_rays(fo, fd, fl, fids, fcfg)))
    _, imgf = timed(f"[{tag}] flagship forward e2e (mxtile)", ff)
    out["fl_img"] = float(imgf)
    return out


set_mode("argsort")          # the round-2/3 pre-pass, forced everywhere
ref = run_legs("argsort")
set_mode(None)               # auto: interval iff coherent, else exact
new = run_legs("auto")
set_mode(None)

pa5 = (ref["cfg5_p"] == new["cfg5_p"]).mean()
paf = (ref["fl_p"] == new["fl_p"]).mean()
oaf = (ref["fl_occ"] == new["fl_occ"]).mean()
print(f"agreement: cfg5 primary {pa5:.6f}  flagship primary {paf:.6f} "
      f"occl {oaf:.6f}", flush=True)
print(f"img sums d: cfg5 {abs(ref['cfg5_img']-new['cfg5_img']):.3e} "
      f"flagship {abs(ref['fl_img']-new['fl_img']):.3e}", flush=True)
assert pa5 == 1.0 and paf == 1.0 and oaf == 1.0, "CULL_MODE must be exact"
print("OK: interval mode winner-identical", flush=True)

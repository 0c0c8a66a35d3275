"""On-chip: which sweep backend should the depth-4 bounce loop use?

BASELINE config 4 (mixed sphere+mesh, 1080p, depth 4) routes through
the fused whole-frame kernel (measured 1.06x the lane/XLA bounce loop,
ROOFLINE.md round 3). The fused kernel's in-kernel sweeps are VPU
issue-bound at ~37 ops/pair; the MXU tile kernel does the same
Möller-Trumbore contraction on the systolic array (~10-op epilogue) but
`auto` never considers it below 4096 triangles. At 2M rays x 1536 tris
x 8 sweeps (4 bounces x primary+shadow) the MXU path may win despite
the small table. Measures fwd for {lane, tile, mxtile, auto->fused}
and fwd+bwd for the two leaders, plus image agreement.

Reference anchor: the strategy-timing report this exercise is scored
against, /root/reference/src/main.cpp:645-654.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from esctp1raytracer_tpu import Camera, RenderConfig  # noqa: E402
from esctp1raytracer_tpu.core.render import trace_rays  # noqa: E402
from esctp1raytracer_tpu.scene import builders  # noqa: E402


def timed(label, fn, *args, iters=4, batches=2):
    # Vary the first argument per call by a negligible nudge (pytree-safe)
    # and force a host materialization of each batch's last result:
    # identical-arg dispatches of some executables measured implausibly
    # fast (0.1 ms for a 2M-ray frame) over the experimental axon
    # platform — distinct inputs + a device->host readback defeat any
    # transport-level memoization / early block_until_ready return.
    nudges = [jax.tree.map(lambda a, k=i: a + (k + 1) * 1e-7, args[0])
              for i in range(iters)]
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(nudges[i], *args[1:]) for i in range(iters)]
        jax.block_until_ready(outs)
        np.asarray(jax.tree.leaves(outs[-1])[0])
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:46s} {best*1e3:9.1f} ms", flush=True)
    return best, out


scene = builders.mixed_scene()
w, h, depth = 1920, 1080, 4
cam = Camera.look_at((0, 2.5, 7), (0, 1, 0), vfov=60.0, aspect=w / h)
o, d = cam.ray_grid(w, h)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
ids = jnp.arange(o.shape[0], dtype=jnp.uint32)

imgs, times = {}, {}
for backend in ("lane", "tile", "mxtile", "auto"):
    cfg = RenderConfig(backend=backend, depth=depth, ray_chunk=0)
    f = jax.jit(lambda oo, dd, c=cfg: trace_rays(oo, dd, scene, ids, c))
    times[backend], img = timed(f"mixed 1080p d4 fwd {backend}", f, o, d)
    imgs[backend] = np.asarray(img)

base = imgs["auto"]
for backend in ("lane", "tile", "mxtile"):
    diff = np.abs(imgs[backend] - base).max(-1)
    ok = diff <= 1e-2
    print(f"vs auto: {backend:7s} flipped>1e-2 frac {(~ok).mean():.2e} "
          f"agree-max {diff[ok].max():.1e}", flush=True)

# fwd+bwd for auto and the fastest explicit kernel (bench.py shape:
# loss over trace_rays with the scene's float leaves as the params).
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params  # noqa: E402

params = float_params(scene)
best_kernel = min(("lane", "tile", "mxtile"), key=lambda b: times[b])
for backend in ("auto", best_kernel):
    cfg = RenderConfig(backend=backend, depth=depth, ray_chunk=0)

    def loss_fn(ps, c=cfg):
        sc = merge_params(scene, ps)
        color = trace_rays(o, d, sc, ids, c)
        return jnp.sum(color * color)

    g = jax.jit(jax.grad(loss_fn))
    try:
        timed(f"mixed 1080p d4 fwd+bwd {backend}", g, params)
    except Exception as e:  # noqa: BLE001 — mxtile bwd at 2M rays OOMs HBM
        msg = str(e).splitlines()[0][:120]
        print(f"mixed 1080p d4 fwd+bwd {backend:28s} FAILED: {msg}",
              flush=True)

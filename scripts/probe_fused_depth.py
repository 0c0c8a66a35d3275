"""On-chip: depth-unrolled fused kernel vs the lane/XLA bounce loop.

Measures the two BASELINE configs the depth unroll re-routes
(ten-sphere 512^2 depth-2, mixed 1080p depth-4) with backend auto
(-> fused) vs lane (the previous routing), plus image agreement.
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
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:46s} {best*1e3:9.1f} ms", flush=True)
    return best, out


CASES = [
    ("ten_sphere 512^2 d2", builders.ten_sphere_scene, (0, 4, 8), 512, 512, 2),
    ("mixed 1080p d4", builders.mixed_scene, (0, 2.5, 7), 1920, 1080, 4),
]

for name, make_scene, eye, w, h, depth in CASES:
    scene = make_scene()
    cam = Camera.look_at(eye, (0, 1, 0), vfov=60.0, aspect=w / h)
    o, d = cam.ray_grid(w, h)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    imgs = {}
    for backend in ("lane", "auto"):
        cfg = RenderConfig(backend=backend, depth=depth, ray_chunk=0)
        f = jax.jit(
            lambda oo, dd, c=cfg: trace_rays(oo, dd, scene, ids, c))
        _, img = timed(f"{name} fwd {backend}", f, o, d)
        imgs[backend] = np.asarray(img)
    diff = np.abs(imgs["lane"] - imgs["auto"]).max(-1)
    print(f"{name}: flipped>{1e-2:g} frac {(diff > 1e-2).mean():.2e} "
          f"agree-max {diff[diff <= 1e-2].max():.1e}", flush=True)

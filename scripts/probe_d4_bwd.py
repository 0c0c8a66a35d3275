#!/usr/bin/env python
"""On-chip A/B: which backend should the fused VJP's backward use on
large deep wavefronts?

The fused whole-frame kernel's custom VJP re-derives the backward
through an XLA-path render (fused_pallas._fused_diff_bwd). The fallback
rule was lane (<= 4096 tris); this probe measures the alternatives on
BASELINE config 4 (mixed 1080p depth-4, 2.07M rays, 1536 tris).

Recorded result (round 5, TPU v5 lite, 3-iter best-of-2 batches):

    lane    chunk=0       983.8 ms
    lane    chunk=262144 1016.2 ms
    mxtile  chunk=262144  653.8 ms   <- winner
    tile    chunk=262144 1024.0 ms
    mxtile  chunk=524288  649.5 ms

Unchunked mxtile OOMs HBM (20.2 G of 15.75: the backward's per-ray
[R,1,3] temps pad 42x under T(8,128)); a 262k-ray chunk bounds them.
Outcome: fused_pallas._bwd_cfg routes >= 1M-ray depth >= 2 wavefronts
to mxtile + ray_chunk=262144 (counter RNG is chunk-invariant so the
re-derived draws match the fused primal). MATRIX_r05 config-4 fwd+bwd:
1000.4 -> 671.8 ms.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from esctp1raytracer_tpu import Camera, RenderConfig  # noqa: E402
from esctp1raytracer_tpu.core.render import trace_rays  # noqa: E402
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params  # noqa: E402
from esctp1raytracer_tpu.scene import builders  # noqa: E402

scene = builders.mixed_scene()
w, h, depth = 1920, 1080, 4
cam = Camera.look_at((0, 2.5, 7), (0, 1, 0), vfov=60.0, aspect=w / h)
o, d = cam.ray_grid(w, h)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
params = float_params(scene)


def timeit(fn, iters=3, batches=2):
    jax.block_until_ready(fn(params))
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(params) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


for backend, chunk in [("lane", 0), ("lane", 262144), ("mxtile", 262144),
                       ("tile", 262144), ("mxtile", 524288)]:
    cfg = RenderConfig(backend=backend, depth=depth, ray_chunk=chunk)

    def loss(ps, c=cfg):
        sc = merge_params(scene, ps)
        col = trace_rays(o, d, sc, ids, c)
        return jnp.sum(col * col)

    g = jax.jit(jax.grad(loss))
    try:
        ms = timeit(g)
        print(f"d4 fwd+bwd {backend:7s} chunk={chunk:7d}: {ms:8.1f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001 — unchunked mxtile OOMs HBM
        print(f"d4 fwd+bwd {backend:7s} chunk={chunk:7d}: FAILED "
              f"{str(e).splitlines()[0][:90]}", flush=True)

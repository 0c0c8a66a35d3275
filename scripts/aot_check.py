"""Kernel-lowering gate: compile every Pallas kernel family x live config
on the real TPU target and exit non-zero on any Mosaic failure.

Motivation (round-3 postmortem): the whole CPU test suite runs Pallas in
interpret mode, which never lowers to Mosaic — a bool fori_loop carry that
Mosaic cannot legalize (vector<8x128xi1> infer-vector-layout) shipped
green on CPU and zeroed the round's on-chip benchmark. This gate compiles
AND runs each kernel entry point on-device, so a CPU-green / device-red
regression is caught before the commit, not at round end.

Coverage: lane / tile / mxtile search + occlusion (the round-1 bundle
kernel was retired round 5 — ROOFLINE.md), mxtile with
bf16x3 on and off, the fused whole-frame kernel at depth 1/2/4, the
composed auto-route forward, and (unless --quick) the fwd+bwd grad path.

Usage:
    python scripts/aot_check.py            # full gate (requires TPU chip)
    python scripts/aot_check.py --quick    # skip the slow grad leg

Policy (README "kernel gate"): run this before every kernel-touching
commit and once at round end. Exit 0 = all green.
"""

import os
import sys
import time
import traceback

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels import rt_mxu
from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search
from esctp1raytracer_tpu.kernels.rt_mxu import (
    mxu_tile_occlusion,
    mxu_tile_search,
)
from esctp1raytracer_tpu.kernels.rt_tile import tile_occlusion, tile_tri_search
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params
from esctp1raytracer_tpu.scene.builders import random_scene

EPS = 1e-4


def _rays(n=2048, seed=0):
    cam = Camera.look_at((0.0, 1.5, 4.0), (0.0, 0.5, 0.0), vfov=60.0,
                         aspect=2.0)
    o, d = cam.ray_grid(64, n // 64)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _finite(x):
    x = np.asarray(x)
    if x.dtype == bool or np.issubdtype(x.dtype, np.integer):
        return True
    return bool(np.all(np.isfinite(x) | (x > 1e29)))  # BIG sentinel ok


def check_search(fn, scene):
    o, d = _rays()
    t, idx = jax.jit(lambda o, d: fn(o, d, scene.triangles, EPS))(o, d)
    jax.block_until_ready((t, idx))
    assert _finite(t) and idx.shape == (o.shape[0],)
    # t_limit variant (occlusion-style culling path through the search)
    t2, _ = jax.jit(
        lambda o, d, tl: fn(o, d, scene.triangles, EPS, t_limit=tl)
    )(o, d, jnp.full((o.shape[0],), 3.0, jnp.float32))
    jax.block_until_ready(t2)


def check_occl(fn, scene):
    o, d = _rays()
    tl = jnp.full((o.shape[0],), 5.0, jnp.float32)
    occ = jax.jit(lambda o, d, tl: fn(o, d, tl, scene.triangles, EPS))(o, d, tl)
    jax.block_until_ready(occ)
    assert occ.shape == (o.shape[0],)


def check_render(backend, scene, depth=1):
    o, d = _rays()
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    cfg = RenderConfig(backend=backend, depth=depth)
    c = jax.jit(
        lambda o, d: trace_rays(o, d, scene, ids, cfg)
    )(o, d)
    jax.block_until_ready(c)
    assert _finite(c) and c.shape == (o.shape[0], 3)


def check_grad(backend, scene):
    o, d = _rays(n=1024)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    cfg = RenderConfig(backend=backend, depth=1)
    params = float_params(scene)

    def loss(ps):
        c = trace_rays(o, d, merge_params(scene, ps), ids, cfg)
        return jnp.sum(c * c)

    g = jax.jit(jax.grad(loss))(params)
    jax.block_until_ready(g)
    assert all(_finite(v) for v in jax.tree.leaves(g))


def main() -> int:
    quick = "--quick" in sys.argv
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"aot_check: default backend is {backend!r}, not a TPU — "
              "this gate validates Mosaic lowering and must run on the "
              "chip (interpret mode cannot see lowering failures).",
              file=sys.stderr)
        return 2

    cornell = cornell_box()            # 18 tris: lane + fused territory
    mid = random_scene(8192, seed=1)   # > 4096: tile/mxtile territory

    def mxtile_bf16x3_search(o, d, tris, eps, t_limit=None):
        old = rt_mxu.SEARCH_BF16X3
        rt_mxu.SEARCH_BF16X3 = True
        try:
            return mxu_tile_search(o, d, tris, eps, t_limit=t_limit)
        finally:
            rt_mxu.SEARCH_BF16X3 = old

    checks = [
        ("lane search", lambda: check_search(lane_tri_search, cornell)),
        ("tile search", lambda: check_search(tile_tri_search, mid)),
        ("tile occlusion", lambda: check_occl(tile_occlusion, mid)),
        ("mxtile search", lambda: check_search(mxu_tile_search, mid)),
        ("mxtile search bf16x3",
         lambda: check_search(mxtile_bf16x3_search, mid)),
        ("mxtile occlusion", lambda: check_occl(mxu_tile_occlusion, mid)),
        ("fused depth=1", lambda: check_render("fused", cornell, depth=1)),
        ("fused depth=2", lambda: check_render("fused", cornell, depth=2)),
        ("fused depth=4", lambda: check_render("fused", cornell, depth=4)),
        ("auto route mid-scene fwd", lambda: check_render("auto", mid)),
    ]
    if not quick:
        checks.append(("auto route fwd+bwd", lambda: check_grad("auto", mid)))

    failures = []
    for name, fn in checks:
        t0 = time.time()
        try:
            fn()
            print(f"  PASS  {name:28s} ({time.time() - t0:5.1f}s)")
        except Exception:
            failures.append(name)
            print(f"  FAIL  {name:28s} ({time.time() - t0:5.1f}s)")
            traceback.print_exc(limit=6)
    if failures:
        print(f"aot_check: {len(failures)}/{len(checks)} FAILED: "
              + ", ".join(failures), file=sys.stderr)
        return 1
    print(f"aot_check: all {len(checks)} kernel configs lower and run "
          f"clean on {jax.devices()[0].device_kind}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

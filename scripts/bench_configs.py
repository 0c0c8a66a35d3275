#!/usr/bin/env python
"""BASELINE.json config matrix benchmark.

Runs the five canonical configs (single-chip; config 5's multi-host
sharding falls back to the local mesh) and prints a JSON line per config:
forward ms, forward+backward ms, rays/s. Heavier than bench.py — not run
by the driver; use for tracking per-config performance.

  1. sphere+plane        256x256   depth 1
  2. 10-sphere + shadows 512x512   depth 2
  3. ~10k-tri mesh       1920x1080 depth 1
  4. mixed sphere+mesh   1920x1080 depth 4 (differentiable)
  5. 100k-tri soup       3840x2160 depth 1 (sharded over local mesh)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from esctp1raytracer_tpu import Camera, RenderConfig  # noqa: E402
from esctp1raytracer_tpu.core.render import resolve_backend, trace_rays  # noqa: E402
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params  # noqa: E402
from esctp1raytracer_tpu.scene import builders  # noqa: E402

CONFIGS = [
    ("sphere_plane_256", builders.sphere_plane_scene, (0, 2, 6), 256, 256, 1),
    ("ten_sphere_512", builders.ten_sphere_scene, (0, 4, 8), 512, 512, 2),
    ("mesh10k_1080p", lambda: builders.mesh_scene(4), (0, 2, 6), 1920, 1080, 1),
    ("mixed_1080p_d4", builders.mixed_scene, (0, 2.5, 7), 1920, 1080, 4),
    ("soup100k_4k", lambda: builders.random_scene(100_000), (0, 18, 45), 3840, 2160, 1),
]


def run_config(name, make_scene, eye, width, height, depth, backward=True):
    scene = make_scene()
    cam = Camera.look_at(eye, (0, 1, 0), vfov=60.0, aspect=width / height)
    backend = os.environ.get("ESCTP_BENCH_BACKEND", "auto")
    cfg = RenderConfig(backend=backend, depth=depth, ray_chunk=0)
    o, d = cam.ray_grid(width, height)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    rays = o.shape[0]
    params = float_params(scene)

    # A single device execution of ~8e11 ray-triangle pairs dies with a
    # TPU-device error (suspected execution watchdog in the remote
    # terminal; 4K x cornell and 1080p x 100k each run fine). Split giant
    # workloads into host-level slices: cap brute-force pair count (mxu)
    # and raw ray count (the culled pallas path) at known-good sizes.
    slices = 1
    while ((rays // slices) > 2_200_000
           or (backend == "mxu"
               and (rays // slices) * scene.num_triangles > 3e11)):
        slices *= 2
    o_s = o.reshape(slices, -1, 3)
    d_s = d.reshape(slices, -1, 3)
    ids_s = ids.reshape(slices, -1)

    fwd_one = jax.jit(lambda ps, oo, dd, ii: jnp.sum(
        trace_rays(oo, dd, merge_params(scene, ps), ii, cfg) ** 2))

    def fwd(ps):
        return sum(fwd_one(ps, o_s[s], d_s[s], ids_s[s]) for s in range(slices))

    jax.block_until_ready(fwd(params))
    if slices > 1:
        print(f"# {name}: {slices} host-level slices", file=sys.stderr)

    def timeit(fn, iters=2, batches=2):
        # Best batch of several: a single tunnel dispatch hiccup inflates
        # a small-batch mean ~20% run-to-run (see bench.py time_it).
        jax.block_until_ready(fn(params))  # block the warm call too
        best = float("inf")
        for _ in range(batches):
            t0 = time.time()
            out = [fn(params) for _ in range(iters)]
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters)
        return best

    dt_f = timeit(fwd)
    record = {
        "config": name, "rays": rays, "tris": scene.num_triangles,
        "depth": depth, "backend": resolve_backend(cfg, scene),
        "device": jax.devices()[0].device_kind,
        "forward_ms": round(dt_f * 1e3, 1),
        "forward_rays_per_s": round(rays / dt_f, 1),
    }
    if backward:
        bwd_one = jax.jit(jax.grad(lambda ps, oo, dd, ii: jnp.sum(
            trace_rays(oo, dd, merge_params(scene, ps), ii, cfg))))

        def bwd(ps):
            gs = [bwd_one(ps, o_s[s], d_s[s], ids_s[s]) for s in range(slices)]
            if slices == 1:
                return gs[0]
            return jax.tree.map(lambda *x: sum(x), *gs)

        jax.block_until_ready(bwd(params))
        dt_b = timeit(bwd)
        record["fwd_bwd_ms"] = round(dt_b * 1e3, 1)
        record["fwd_bwd_rays_per_s"] = round(rays / dt_b, 1)
    print(json.dumps(record), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_path = next((a.split("=", 1)[1] for a in sys.argv[1:]
                      if a.startswith("--json=")), None)
    only = args[0] if args else None
    if only is None:
        # One subprocess per config: a single long-lived process accretes
        # device state and the timings of later configs degrade badly
        # (measured >10x); isolated processes give stable numbers.
        import subprocess
        lines = []
        for name, *_ in CONFIGS:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                check=False, capture_output=True, text=True)
            sys.stderr.write(proc.stderr)
            sys.stdout.write(proc.stdout)
            sys.stdout.flush()
            lines += [ln for ln in proc.stdout.splitlines()
                      if ln.startswith("{")]
        if json_path:
            # The committed on-chip artifact (e.g. MATRIX_r04.json): one
            # record per BASELINE config, backend + device per leg.
            records = [json.loads(ln) for ln in lines]
            with open(json_path, "w") as f:
                json.dump(records, f, indent=1)
                f.write("\n")
            print(f"# wrote {json_path} ({len(records)} configs)",
                  file=sys.stderr)
        return
    for name, make_scene, eye, w, h, depth in CONFIGS:
        if only not in name:
            continue
        run_config(name, make_scene, eye, w, h, depth)


if __name__ == "__main__":
    main()

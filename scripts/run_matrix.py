#!/usr/bin/env python
"""Strategy-matrix runner — the reference's scripts/run.sh, framework-side.

Renders the canonical Cornell workload once per execution strategy
{sequential(jnp), --thread(sharded), --bvh(mxu), --ispc(pallas)}, writes
output<suffix>.ppm files, prints the per-strategy timing table, and
cross-checks the images against each other (the reference's de-facto
golden comparison, done automatically instead of by eye).

Usage: python scripts/run_matrix.py [--out DIR] [--size WxH] [--scene ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import sys
import time


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from esctp1raytracer_tpu import Camera, RenderConfig, render, write_ppm  # noqa: E402
from esctp1raytracer_tpu.parallel import make_mesh, render_sharded  # noqa: E402

STRATEGIES = [
    # (suffix, backend, sharded) — one row per reference strategy
    # (scripts/run.sh:36-41: none, --thread, --bvh, --bvh --thread, --ispc),
    # same mapping as the CLI strategy flags (cli.py:main).
    ("sequential", "jnp", False),
    ("thread", "auto", True),   # best kernel, sharded over the device mesh
    ("bvh", "mxu", False),
    ("bvh_thread", "auto", True),  # accelerated search + sharded rays
    ("ispc", "auto", False),  # auto: fused/lane/mxtile/tile by scene shape
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/plain")
    ap.add_argument("--size", default="1024x768")
    ap.add_argument("--eye", default="0,1,2")
    ap.add_argument("--look", default="0,1,0")
    ap.add_argument("--scene", default="original",
                    choices=("original", "mirror", "glossy", "sphere",
                             "water", "empty_co", "empty_rg", "empty_white",
                             "empty_squashed", "empty_nolight"),
                    help="Cornell model variant (src/models/cornell/*)")
    ap.add_argument("--depth", type=int, default=1,
                    help="Whitted reflection bounces")
    ap.add_argument("--json", default="",
                    help="also write the strategy table as JSON (the "
                         "committed on-chip artifact, e.g. RUN_MATRIX.json)")
    args = ap.parse_args()
    width, height = (int(x) for x in args.size.split("x"))
    eye = tuple(float(x) for x in args.eye.split(","))
    look = tuple(float(x) for x in args.look.split(","))

    os.makedirs(args.out, exist_ok=True)
    from esctp1raytracer_tpu.scene.builders import cornell_variant

    scene = cornell_variant(args.scene)
    cam = Camera.look_at(eye, look, vfov=60.0, aspect=width / height)
    mesh = make_mesh()

    images = {}
    table_rows = []
    print(f"{'strategy':<12} {'backend':<8} {'first(ms)':>10} {'steady(ms)':>11} {'Mrays/s':>9}")
    for suffix, backend, sharded in STRATEGIES:
        # jnp's broadcast search needs chunking to bound its [chunk, N, 3]
        # intermediates; the kernel backends are fastest unchunked.
        chunk = 262144 if backend == "jnp" else 0
        cfg = RenderConfig(backend=backend, ray_chunk=chunk,
                           depth=args.depth)

        def go():
            if sharded:
                return render_sharded(scene, cam, width, height, cfg, mesh)
            return render(scene, cam, width, height, cfg)

        t0 = time.perf_counter()
        img = jax.block_until_ready(go())
        first = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        img = jax.block_until_ready(go())
        steady = (time.perf_counter() - t0) * 1e3
        mrays = width * height / (steady / 1e3) / 1e6
        print(f"{suffix:<12} {backend:<8} {first:>10.1f} {steady:>11.1f} {mrays:>9.2f}")
        table_rows.append((suffix, backend, first, steady, mrays))
        arr = np.asarray(img)
        images[suffix] = arr
        write_ppm(os.path.join(args.out, f"output{suffix}.ppm"), arr)

    # Cross-strategy golden comparison (same seed -> near-identical images;
    # borderline eps-window pixels may flip between backends).
    base = images["sequential"]
    ok = True
    flips_by = {}
    for suffix, arr in images.items():
        if suffix == "sequential":
            continue
        diff = np.abs(arr - base).max(-1)
        flips = float((diff > 1e-3).mean())
        flips_by[suffix] = flips
        status = "OK" if flips < 0.005 else "MISMATCH"
        ok &= flips < 0.005
        print(f"  {suffix:<10} vs sequential: {flips*100:.3f}% pixels differ -> {status}")
    if args.json:
        import json
        import platform

        rec = {
            "workload": {"scene": f"cornell_{args.scene}" if args.scene != "original"
                         else "cornell", "size": args.size, "eye": args.eye,
                         "look": args.look, "depth": args.depth},
            "backend_platform": jax.devices()[0].platform,
            "device_kind": jax.devices()[0].device_kind,
            "host": platform.node(),
            "strategies": [
                {"strategy": s, "backend": b, "first_ms": round(f, 1),
                 "steady_ms": round(st, 1), "mrays_per_s": round(m, 2)}
                for s, b, f, st, m in table_rows
            ],
            "cross_check_flip_frac": flips_by,
            "all_match": ok,
        }
        with open(args.json, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"wrote {args.json}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

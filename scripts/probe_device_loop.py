#!/usr/bin/env python
"""Device-side per-frame timing for the 5 BASELINE configs.

Motivation: the two host-side protocols disagree badly on the axon
tunnel. Identical-arg dispatch (bench_configs.timeit) is exposed to
transport-level memoization (r4: 0.1 ms for a 2M-ray frame); per-call
nudged inputs + full-image readback (probe_d4_backend.timed) charges
host<->device transfer at ~10 MB/s to the frame (r5: lane "slowed"
4-10x on configs it was never changed on). This probe removes the host
from the measurement entirely: ONE jitted program runs K frames in a
`lax.fori_loop`, varying the ray-id stream per iteration (so the RNG
draws differ and XLA cannot hoist the render out of the loop) and
accumulating a scalar; per-frame device time = (T(K2) - T(K1))/(K2 -
K1), which cancels dispatch, transfer, and any per-call transport
artifact exactly. These are the numbers BENCH_CONFIGS.md cites as the
device-throughput cross-check of MATRIX_r05.json.

Reference anchor: the reference times render() start-to-finish on the
host (src/main.cpp:645-654) — legitimate there (host compute); through
a 10 MB/s tunnel the equivalent would measure the tunnel.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
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
from esctp1raytracer_tpu.core.render import resolve_backend, trace_rays  # noqa: E402
from esctp1raytracer_tpu.parallel.sharding import float_params, merge_params  # noqa: E402
from esctp1raytracer_tpu.scene import builders  # noqa: E402

def _flagship_scene():
    """The driver benchmark's scene (bench.py:build_scene): two 5120-tri
    icospheres (one smooth, one flat) + ground + area light, 1080p."""
    meshes = [
        builders.icosphere_mesh(subdivisions=4, radius=1.0,
                                center=(-1.3, 1.0, 0.0)),
        builders.icosphere_mesh(subdivisions=4, radius=1.0,
                                center=(1.3, 1.0, 0.0), smooth=False),
        builders._ground_plane(),
        builders._area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ]
    return builders.scene_from_mesh(meshes)


CONFIGS = [
    ("sphere_plane_256", builders.sphere_plane_scene, (0, 2, 6), 256, 256, 1),
    ("flagship_10k_1080p", _flagship_scene, (0, 2, 6), 1920, 1080, 1),
    ("ten_sphere_512", builders.ten_sphere_scene, (0, 4, 8), 512, 512, 2),
    ("mesh10k_1080p", lambda: builders.mesh_scene(4), (0, 2, 6), 1920, 1080, 1),
    ("mixed_1080p_d4", builders.mixed_scene, (0, 2.5, 7), 1920, 1080, 4),
    ("soup100k_4k", lambda: builders.random_scene(100_000), (0, 18, 45), 3840, 2160, 1),
]


def loop_ms(make_loss, params, k1, k2):
    """Per-frame ms from the K2-vs-K1 in-graph loop difference."""
    ts = {}
    for k in (k1, k2):
        f = jax.jit(make_loss(k))
        jax.block_until_ready(f(params))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(params))
            best = min(best, time.time() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1) * 1e3, ts


def main():
    out_path = next((a.split("=", 1)[1] for a in _sys.argv[1:]
                     if a.startswith("--json=")), None)
    only = next((a for a in _sys.argv[1:] if not a.startswith("--")), None)
    records = []
    for name, mk, eye, w, h, depth in CONFIGS:
        if only and only not in name:
            continue
        scene = mk()
        cam = Camera.look_at(eye, (0, 1, 0), vfov=60.0, aspect=w / h)
        o, d = cam.ray_grid(w, h)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        rays = o.shape[0]
        cfg = RenderConfig(backend="auto", depth=depth, ray_chunk=0)
        params = float_params(scene)

        # Host-level slicing as bench_configs (watchdog-safe sizes).
        slices = 1
        while rays // slices > 2_200_000:
            slices *= 2
        o_s = o.reshape(slices, -1, 3)
        d_s = d.reshape(slices, -1, 3)
        base_ids = jnp.arange(rays // slices, dtype=jnp.uint32)

        grad_mode = "--grad" in _sys.argv

        def make_loss(k, s=slices, o_s=o_s, d_s=d_s, scene=scene, cfg=cfg,
                      rays=rays):
            def frame_loss(ps, i):
                sc = merge_params(scene, ps)
                tot = jnp.float32(0.0)
                for sl in range(s):
                    ids = base_ids + i * jnp.uint32(rays) \
                        + jnp.uint32(sl * (rays // s))
                    c = trace_rays(o_s[sl], d_s[sl], sc, ids, cfg)
                    tot = tot + jnp.sum(c * c)
                return tot

            if grad_mode:
                # Device-side fwd+bwd: each frame computes the full
                # scene-parameter gradient; the scalar carry folds a
                # gradient norm so nothing is dead code. Gradients run
                # PER SLICE (like bench_configs' bwd) so only one
                # slice's residuals are ever live.
                def slice_loss(ps, i, sl):
                    sc = merge_params(scene, ps)
                    ids = base_ids + i * jnp.uint32(rays) \
                        + jnp.uint32(sl * (rays // s))
                    c = trace_rays(o_s[sl], d_s[sl], sc, ids, cfg)
                    return jnp.sum(c * c)

                def loss(ps):
                    def frame(i, acc):
                        for sl in range(s):
                            g = jax.grad(slice_loss)(ps, i, sl)
                            acc = acc + sum(jnp.sum(l * l)
                                            for l in jax.tree.leaves(g))
                        return acc

                    return jax.lax.fori_loop(0, k, frame, jnp.float32(0.0))
            else:
                def loss(ps):
                    def frame(i, acc):
                        return acc + frame_loss(ps, i)

                    return jax.lax.fori_loop(0, k, frame, jnp.float32(0.0))
            return loss

        # Small frames need a wide K spread: at ~4 ms/frame the +-20 ms
        # dispatch jitter swamps an 8-frame difference (the first capture
        # measured config 2 NEGATIVE), so spread until the frame term
        # dominates.
        k1, k2 = (1, 3) if rays > 1_000_000 else (2, 50)
        ms, raw = loop_ms(make_loss, params, k1, k2)
        rec = {"config": name, "rays": rays,
               "backend": resolve_backend(cfg, scene),
               "leg": "fwd+bwd" if grad_mode else "fwd",
               "device_frame_ms": round(ms, 2),
               "device_rays_per_s": round(rays / (ms / 1e3), 1),
               "loop_k": [k1, k2],
               "raw_s": {str(k): round(v, 4) for k, v in raw.items()}}
        print(json.dumps(rec), flush=True)
        records.append(rec)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(records, f, indent=1)
            f.write("\n")
        print(f"# wrote {out_path}", file=_sys.stderr)


if __name__ == "__main__":
    main()

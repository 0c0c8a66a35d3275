"""Sharded-render throughput scaling on a virtual CPU device mesh.

Measures render_sharded rays/s at 1/2/4/8 devices (XLA's
host-platform-device-count trick) plus the unsharded single-device
baseline, validating that the shard_map path adds no per-frame overhead
(the round-1 bug: per-call re-tracing made 'sharded' 7x slower than jit).

Virtual CPU devices share one host's cores, so absolute scaling here
reflects dispatch/partition overhead, not ICI bandwidth — the number that
must hold on real hardware is `sharded(1) ~= jit(1)` and flat ms/frame as
devices increase with the workload fixed per device (weak scaling).

Usage (writes SCALING.md):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_scaling.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box
from esctp1raytracer_tpu.parallel import make_mesh, render_sharded
from esctp1raytracer_tpu.core.render import render

W, H = 512, 384


def timed(fn, iters=3):
    jax.block_until_ready(fn())
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    scene = cornell_box()
    cam = Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=W / H)
    cfg = RenderConfig(backend="mxu", ray_chunk=0)
    rows = []

    dt = timed(lambda: render(scene, cam, W, H, cfg))
    base = W * H / dt
    rows.append(("jit (unsharded)", 1, dt * 1e3, base / 1e6, 1.0))
    print(f"jit 1dev: {dt*1e3:.1f} ms", flush=True)

    for n in (1, 2, 4, 8):
        if jax.device_count() < n:
            break
        mesh = make_mesh(jax.devices()[:n])
        dt = timed(lambda: render_sharded(scene, cam, W, H, cfg, mesh))
        rate = W * H / dt
        rows.append((f"sharded rays={n}", n, dt * 1e3, rate / 1e6, rate / base))
        print(f"sharded {n}dev: {dt*1e3:.1f} ms ({rate/base:.2f}x jit)", flush=True)

    # --- collective/dispatch residual, compute-controlled --------------
    # Virtual CPU devices share the host's physical cores, so growing the
    # device count grows total compute on fixed cores — useless as a
    # weak-scaling signal. Instead, render the SAME frame unsharded and
    # sharded over n devices: total compute is identical, the executable
    # is cached per (mesh, cfg) (no re-trace), so the delta is exactly
    # the partition dispatch + collective cost.
    weak_rows = []
    for n in (2, 4, 8):
        if jax.device_count() < n:
            break
        h_n = 96 * n
        dt_jit = timed(lambda: render(scene, cam, W, h_n, cfg))
        mesh = make_mesh(jax.devices()[:n])
        dt_sh = timed(lambda: render_sharded(scene, cam, W, h_n, cfg, mesh))
        weak_rows.append((n, W * h_n, dt_jit * 1e3, dt_sh * 1e3))
        print(f"residual {n}dev ({W}x{h_n}): jit {dt_jit*1e3:.1f} ms, "
              f"sharded {dt_sh*1e3:.1f} ms", flush=True)

    # --- sharded fwd+bwd step (the production train step) --------------
    from esctp1raytracer_tpu.parallel.sharding import loss_and_grad_sharded

    grad_rows = []
    tgt = jax.numpy.zeros((192, 256, 3), jax.numpy.float32)
    gcam = Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=256 / 192)
    for n in (1, 8):
        if jax.device_count() < n:
            break
        mesh = make_mesh(jax.devices()[:n])
        dt = timed(lambda: loss_and_grad_sharded(scene, tgt, gcam, cfg, mesh))
        grad_rows.append((n, dt * 1e3))
        print(f"grad step {n}dev: {dt*1e3:.1f} ms", flush=True)

    # --- prims-axis cost model ---------------------------------------
    # The 'prims' axis splits only the search; shading is replicated
    # across it (documented trade: at N >> 1k triangles search dominates,
    # so the redundancy is noise; at small N use the rays axis).
    from esctp1raytracer_tpu.scene.builders import mesh_scene

    prims_rows = []
    if jax.device_count() >= 8:
        pscene = mesh_scene(subdivisions=4)  # ~5.6k triangles
        pcam = Camera.look_at((0, 2, 6), (0, 1, 0), vfov=60.0, aspect=1.0)
        for rays_n, prims_n in ((8, 1), (4, 2), (2, 4)):
            mesh = make_mesh(jax.devices()[:8], rays=rays_n, prims=prims_n)
            dt = timed(lambda: render_sharded(pscene, pcam, 256, 256, cfg, mesh))
            prims_rows.append((rays_n, prims_n, dt * 1e3))
            print(f"mesh rays={rays_n} prims={prims_n}: {dt*1e3:.1f} ms",
                  flush=True)

    # --- analytic ICI model: the number CPU meshes cannot give ---------
    # Counts the actual bytes each collective moves per train step for
    # the flagship 1080p/10k-tri workload and compares them with the
    # measured per-chip step time, under stated v5e assumptions.
    from esctp1raytracer_tpu.parallel.sharding import float_params
    from esctp1raytracer_tpu.scene.builders import (
        _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
    )

    flagship = scene_from_mesh([
        icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
        icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                       smooth=False),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ])
    p_bytes = int(sum(int(np.prod(p.shape)) for p in float_params(flagship))) * 4
    T1_MS = 248.0        # measured fwd+bwd step, 1 chip, round-2 probe
    ICI_BPS = 4.5e10     # v5e one-direction per-link ICI, bytes/s (assumed)
    HOP_S = 1e-6         # per-hop latency (assumed)
    model_rows = []
    for s in (2, 4, 8, 16, 32, 256):
        wire = 2 * p_bytes * (s - 1) / s          # ring all-reduce, per chip
        t_comm = wire / ICI_BPS + 2 * (s - 1) * HOP_S
        t_comp = T1_MS / 1e3 / s
        eff = t_comp / (t_comp + t_comm)
        model_rows.append((s, wire / 1e6, t_comm * 1e3, t_comp * 1e3, eff))

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SCALING.md")
    with open(out, "w") as fh:
        fh.write("# Sharded-render scaling (virtual CPU mesh)\n\n")
        fh.write(f"Cornell {W}x{H}, backend mxu, `scripts/bench_scaling.py` "
                 "on an 8-virtual-device CPU host (shared cores — overhead "
                 "check, not an ICI measurement; see script docstring).\n\n")
        fh.write("| Mode | Devices | ms/frame | Mrays/s | vs 1-dev jit |\n")
        fh.write("|---|---|---|---|---|\n")
        for name, n, ms, mrays, ratio in rows:
            fh.write(f"| {name} | {n} | {ms:.1f} | {mrays:.2f} | {ratio:.2f}x |\n")
        if weak_rows:
            fh.write(
                "\n## Collective/dispatch residual (compute-controlled)\n\n"
                "Same frame rendered unsharded vs sharded over n virtual "
                "devices: total compute identical (shared physical cores), "
                "executable cached per (mesh, cfg) so re-trace is excluded "
                "— the delta bounds the partition dispatch + collective "
                "cost. A NEGATIVE residual means the collectives cost less "
                "than what multi-device execution gains in core "
                "utilization: the overhead is below measurement floor.\n\n"
                "| Devices | rays | jit ms | sharded ms | residual |\n"
                "|---|---|---|---|---|\n")
            for n, rays_n, ms_j, ms_s in weak_rows:
                fh.write(f"| {n} | {rays_n} | {ms_j:.1f} | {ms_s:.1f} | "
                         f"{ms_s - ms_j:+.1f} ms ({(ms_s/ms_j-1)*100:+.0f}%) |\n")
        if grad_rows:
            fh.write(
                "\n## Sharded fwd+bwd train step (grad psum included)\n\n"
                "| Devices | ms/step |\n|---|---|\n")
            for n, ms in grad_rows:
                fh.write(f"| {n} | {ms:.1f} |\n")
        if prims_rows:
            fh.write(
                "\n## ('rays' x 'prims') factorization, ~5.6k-tri mesh, 256²\n\n"
                "The prims axis splits the closest-hit search; per-shard "
                "minima combine with two O(rays) pmin all-reduces "
                "(parallel/sharding.py:_prim_sharded_search — was an "
                "O(S*rays) all_gather). Shading is replicated across the "
                "axis, which is noise once the triangle table dominates "
                "(search:shade compute ratio grows linearly in N).\n\n"
                "| rays x prims | ms/frame |\n|---|---|\n")
            for rn, pn, ms in prims_rows:
                fh.write(f"| {rn} x {pn} | {ms:.1f} |\n")
        fh.write(
            "\n## Analytic ICI model — predicted multi-chip efficiency\n\n"
            "Data-parallel training step on the flagship 1080p x 10.2k-tri "
            "workload: rays sharded, scene replicated, gradients psum'd. "
            "Exact per-chip wire bytes for a bidirectional-ring all-reduce "
            "are `2 * P * (S-1)/S` with P = "
            f"{p_bytes/1e6:.2f} MB of float scene parameters (counted from "
            "the live pytree). Assumptions: one v5e ICI link direction at "
            "45 GB/s drives the ring (conservative: a 2D torus has more "
            "links), 1 us/hop latency, ZERO overlap of the psum with the "
            "backward pass (XLA in fact overlaps it), and the measured "
            f"single-chip step time of {T1_MS:.0f} ms (round-2 probe; "
            "re-verify via bench.py).\n\n"
            "| Chips | wire MB/chip | t_comm (ms) | t_comp (ms) | "
            "efficiency |\n|---|---|---|---|---|\n")
        for s, mb, tc, tp, eff in model_rows:
            fh.write(f"| {s} | {mb:.2f} | {tc:.3f} | {tp:.1f} | "
                     f"{eff*100:.1f}% |\n")
        fh.write(
            "\nEven at 256 chips (~1 ms of compute left per step) the "
            "unoverlapped grad psum costs well under a millisecond, so the "
            "BASELINE >=85% scaling target is comm-feasible with large "
            "margin; the practical limits are load imbalance across ray "
            "shards and per-dispatch host overhead, both measured above on "
            "the CPU mesh (weak-scaling residual). The 'prims' axis adds "
            "two O(rays/chip) pmin all-reduces per bounce — e.g. 0.26 MB "
            "per chip per collective at 1080p on 32 chips, ~6 us of ICI — "
            "independent of the axis size after the pmin rewrite.\n")
    print(f"wrote {out}", flush=True)
    ok = rows[1][4] >= 0.6  # sharded(1) within 1.7x of jit(1)
    print("PASS" if ok else "FAIL: sharded(1) slower than 1.7x jit(1)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

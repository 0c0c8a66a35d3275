"""The renderer: camera rays -> closest hit -> shade -> (reflect)* -> image.

This replaces the reference's three tracer cores (`scan_row`
src/main.cpp:698-882, the C dispatch chain src/main.cpp:176-312, and the
ISPC `trace` kernel src/ispc/trace.ispc:86-272) with one fused, jitted
pipeline over the whole ray grid. The per-pixel double loop becomes array
ops; the per-row threading strategy becomes ray-chunking (`lax.map`) on one
device and mesh sharding in parallel/; and the scalar recursion the
reference never had is an iterative fixed-depth Whitted reflection loop
(statically unrolled — depth <= ~4), end-to-end differentiable.

Backends (RenderConfig.backend):
  "jnp"    — pure jnp brute force (broadcast Möller–Trumbore);
  "mxu"    — same search expressed as the feature matmul (MXU);
  "lane"/"tile"/"mxtile" — the Pallas kernel families (kernels/);
  "fused"/"auto" — whole-frame fused kernel when eligible, else by size;
  "pallas" — deprecated alias of "auto" (the round-1 bundle kernel it
  named was retired in round 5 — it won no measured regime, ROOFLINE.md).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from esctp1raytracer_tpu.core.camera import Camera
from esctp1raytracer_tpu.core.intersect import EPS, any_hit, closest_hit
from esctp1raytracer_tpu.core.shading import shade
from esctp1raytracer_tpu.scene.types import Scene


@dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable; safe as a jit static arg).

    eps mirrors the reference's intersection epsilon
    (std::numeric_limits<float>::epsilon(), src/scene/ray_triangle.h:23);
    shadow_eps is the hit-point back-off / shadow-ray limit epsilon, where
    we standardize on the ISPC backend's 1e-4 (src/ispc/ispc_helpers.h:5)
    — the C++ float-eps value is numerically meaningless at scene scale
    (documented divergence).
    """

    depth: int = 1
    eps: float = float(EPS)
    shadow_eps: float = 1e-4
    block_size: int = 512
    ray_chunk: int = 0  # 0 = trace all rays in one wavefront
    # "jnp"|"mxu"|"tile"|"mxtile"|"lane"|"fused"|"auto"
    # ("pallas" is accepted as a deprecated alias of "auto")
    backend: str = "jnp"
    seed: int = 0
    # "area" = corrected ISPC-style area-light sampling;
    # "reference_cpp" = bit-faithful reproduction of the C++ path's
    # degenerate corner sampling (quirk 2) for golden-image parity.
    light_mode: str = "area"

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def _auto_backend(scene: Scene = None) -> str:
    """Size-based half of the "auto" routing (the fused whole-frame gate
    runs earlier, in trace_rays): lane < 4k tris <= mxtile <= one VMEM
    segment < tile. Thresholds measured on-chip:

    Small tables: the ray-lane brute-force kernel (every VPU lane a
    ray, scalar loop over triangles) — its cost scales with N and
    beats both the bundle kernel's per-ray floor and the MXU path's
    [R, N] HBM intermediates. Mid-size tables (one VMEM-resident
    segment): the MXU tile kernel — the Möller-Trumbore trilinear
    forms as a [128,16]@[16,512] systolic matmul per block; beats
    the VPU tile kernel 1.26-1.45x (flagship forward 219 vs 276 ms,
    scripts/probe_mxu.py), pixel-identical. Beyond one segment the
    (8 rays x 128 tris) VPU tile kernel takes over: its whole-table
    residency + 8-ray cull granularity win decisively on the
    segmented 100k-tri regime (config 5: tile 2.7 s vs mxtile 22 s
    — per-128-ray cull unions collapse on incoherent soup).
    """
    n = scene.triangles.capacity if scene is not None else 0
    if n < 4096:
        return "lane"
    from esctp1raytracer_tpu.kernels.rt_mxu import MXU_TRI_LIMIT

    return "mxtile" if n <= MXU_TRI_LIMIT else "tile"


def _canon_backend(backend: str) -> str:
    """"pallas" named the round-1 bundle kernel; it was retired in round
    5 after winning no measured regime (ROOFLINE.md), and the name now
    aliases "auto" so existing configs/CLIs keep working."""
    return "auto" if backend == "pallas" else backend


def resolve_backend(cfg: RenderConfig, scene: Scene = None) -> str:
    """Concrete backend name trace_rays will route (cfg, scene) to —
    the fused whole-frame gate first, then the size-based auto rule.
    Reporting/artifact helper (MATRIX_rN legs record which kernel ran);
    traces nothing."""
    backend = _canon_backend(cfg.backend)
    if backend in ("fused", "auto") and scene is not None:
        from esctp1raytracer_tpu.kernels.fused_pallas import (
            _fallback_cfg, fused_supported,
        )

        if fused_supported(scene, cfg.depth, cfg.light_mode):
            return "fused"
        if backend == "fused":
            backend = _fallback_cfg(scene, cfg).backend
    if backend == "auto":
        backend = _auto_backend(scene)
    return backend


def _search_fns(cfg: RenderConfig, scene: Scene = None):
    """Resolve the closest-hit / any-hit triangle search for a backend.

    "auto" picks per scene size (thresholds measured on-chip, see
    _auto_backend): lane < 4k tris <= mxtile <= one VMEM segment < tile.
    """
    backend = _canon_backend(cfg.backend)
    if backend == "auto":
        backend = _auto_backend(scene)
    if backend == "lane":
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        return lane_tri_search, True
    if backend == "tile":
        from esctp1raytracer_tpu.kernels.rt_tile import tile_tri_search

        return tile_tri_search, True
    if backend == "mxtile":
        from esctp1raytracer_tpu.kernels.rt_mxu import mxu_tile_search

        return mxu_tile_search, True
    if backend == "mxu":
        return None, True
    if backend == "jnp":
        return None, False
    raise ValueError(f"unknown backend {cfg.backend!r}")


def trace_rays(
    o: jax.Array,
    d: jax.Array,
    scene: Scene,
    ray_ids: jax.Array,
    cfg: RenderConfig,
    tri_search=None,
) -> jax.Array:
    """Trace one wavefront of rays [R, 3] to colors [R, 3].

    Depth-1 is exactly the reference pipeline (primary ray + shadow rays);
    depth>1 adds iterative Whitted reflections: throughput *= ks, ray
    reflects about the shading normal, contributions accumulate — the
    "iterative fixed-depth bounce loop" from BASELINE.json that replaces
    scalar recursion.

    When cfg.ray_chunk > 0 and R exceeds it, rays stream through
    `lax.map` in ray_chunk-sized wavefronts, bounding the [chunk, block]
    intermediates in HBM; the counter-based RNG makes the result
    independent of the chunking.
    """
    r = o.shape[0]
    if cfg.ray_chunk and cfg.ray_chunk < r:
        chunk = cfg.ray_chunk
        pad = (-r) % chunk
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate(
                [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
            )
            ray_ids = jnp.concatenate(
                [ray_ids, jnp.zeros((pad,), ray_ids.dtype)]
            )
        inner = cfg.replace(ray_chunk=0)

        def one_chunk(args):
            oc, dc, ids = args
            return trace_rays(oc, dc, scene, ids, inner, tri_search)

        color = jax.lax.map(
            one_chunk,
            (o.reshape(-1, chunk, 3), d.reshape(-1, chunk, 3),
             ray_ids.reshape(-1, chunk)),
        )
        return color.reshape(-1, 3)[:r]
    if _canon_backend(cfg.backend) in ("fused", "auto"):
        from esctp1raytracer_tpu.kernels.fused_pallas import (
            _fallback_cfg, fused_supported, fused_trace_diff,
        )

        if tri_search is not None:
            # An injected search (e.g. the prim-sharded mesh search) means
            # the whole-frame kernel cannot be used: resolve to its
            # fallback backend instead of falling through to _search_fns
            # (which has no "fused" branch).
            if cfg.backend == "fused":
                cfg = _fallback_cfg(scene, cfg)
        elif fused_supported(scene, cfg.depth, cfg.light_mode):
            # Whole-frame kernel (primary + shadow + shading in ONE
            # Pallas call — Cornell 5.5 vs 39 ms on the lane path);
            # differentiable via its custom VJP (XLA-path re-derivation
            # at identical draws), so "auto" is grad-safe.
            return fused_trace_diff(o, d, scene, ray_ids, cfg)
        if cfg.backend == "fused":
            # Unsupported shape (depth>4, reference_cpp sampling, no
            # lights, or an over-limit table): lane/tile fallback.
            cfg = _fallback_cfg(scene, cfg)
    backend_search, use_mxu = _search_fns(cfg, scene)
    if tri_search is None:
        tri_search = backend_search
    eps = jnp.float32(cfg.eps)

    def occl(oo, dd, t_limit):
        return any_hit(
            oo, dd, t_limit, scene, eps,
            block_size=cfg.block_size, use_mxu=use_mxu, tri_search=tri_search,
        )

    r = o.shape[0]
    color = jnp.zeros((r, 3), jnp.float32)
    throughput = jnp.ones((r, 3), jnp.float32)
    active = jnp.ones((r,), bool)

    from esctp1raytracer_tpu.utils.debug import TRACE, current_level

    for bounce in range(cfg.depth):
        # with_row: the winner's packed table row is gathered once here
        # and shared with shading — one scatter-add per bounce in the
        # VJP instead of two (the backward is scatter-bound, ROOFLINE.md).
        hit, trow = closest_hit(
            o, d, scene, eps,
            block_size=cfg.block_size, use_mxu=use_mxu, tri_search=tri_search,
            with_row=True,
            # Bounce 0 is the camera wavefront (shared origin): backends
            # that support it use the cheap interval cull pre-pass.
            # Reflection bounces originate at scattered hit points.
            coherent=(bounce == 0),
        )
        if current_level() >= TRACE:
            # The reference dumps per-hit info under --trace
            # (src/ispc/trace.ispc:94-100, src/main.cpp:607-616); at
            # wavefront scale that becomes a per-bounce hit summary plus
            # the first ray's hit record, printed from the device.
            jax.debug.print(
                "trace[bounce " + str(bounce) + "]: hits={h}/{r} "
                "t[0]={t0} prim[0]={p0} u[0]={u0} v[0]={v0}",
                h=jnp.sum(hit.hit), r=hit.hit.shape[0],
                t0=hit.t[0], p0=hit.prim[0], u0=hit.u[0], v0=hit.v[0],
            )
        local, hit_p, normal, ks = shade(
            o, d, hit, scene, cfg.seed, ray_ids, occl,
            shadow_eps=cfg.shadow_eps, bounce=bounce, light_mode=cfg.light_mode,
            trow=trow,
        )
        color = color + throughput * jnp.where(active[:, None], local, 0.0)
        if bounce + 1 < cfg.depth:
            active = active & hit.hit & (jnp.max(ks, axis=-1) > 0.0)
            throughput = jnp.where(active[:, None], throughput * ks, 0.0)
            d_dot_n = jnp.sum(d * normal, axis=-1, keepdims=True)
            refl = d - 2.0 * d_dot_n * normal
            refl = refl * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(refl * refl, axis=-1, keepdims=True), 1e-12)
            )
            o = jnp.where(active[:, None], hit_p, o)
            d = jnp.where(active[:, None], refl, d)
    return color


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
) -> jax.Array:
    """Render a [height, width, 3] float32 image.

    Row h of the result is image row h in the reference's framebuffer
    layout (image[h*W+w], src/main.cpp:786-788); the PPM writer emits rows
    top-to-bottom as h = H-1 .. 0 exactly like src/main.cpp:661.
    """
    o, d = camera.ray_grid(width, height)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    ray_ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    color = trace_rays(o, d, scene, ray_ids, cfg)
    return color.reshape(height, width, 3)


def render_to_numpy(scene, camera, width, height, cfg=RenderConfig()) -> np.ndarray:
    return np.asarray(jax.block_until_ready(render(scene, camera, width, height, cfg)))

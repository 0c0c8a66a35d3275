"""Fused frame kernel parity (interpret mode on CPU).

The fused kernel replays the whole shade pipeline in one Pallas program,
so the test strategy is end-image equality against the lane/jnp XLA path
— the same cross-backend golden method the reference used for its ISPC
kernel (SURVEY.md §4). The RNG is counter-based and replicated bit-for-
bit in-kernel, so images must agree to float rounding, not statistics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.kernels.fused_pallas import (
    FUSED_TRI_LIMIT,
    fused_supported,
)
from esctp1raytracer_tpu.scene.builders import (
    cornell_variant,
    mesh_scene,
    mixed_scene,
)

CAM = Camera.look_at((0, 1, 2), (0, 1, 0), aspect=4 / 3)


def _frames(scene, cam=CAM, w=64, h=48, seed=0, **kw):
    ref_cfg = RenderConfig(backend="lane", seed=seed, **kw)
    fus_cfg = ref_cfg.replace(backend="fused")
    a = np.asarray(render(scene, cam, w, h, ref_cfg))
    b = np.asarray(render(scene, cam, w, h, fus_cfg))
    return a, b


def _assert_close(a, b, atol=3e-5, flip_frac=2e-3):
    """Equal up to float rounding; borderline eps-window / occlusion flips
    may move a handful of pixels, so compare the agreeing set tightly and
    bound the disagreeing fraction."""
    diff = np.abs(a - b).max(axis=-1)
    flipped = diff > 1e-2
    assert flipped.mean() <= flip_frac, f"{flipped.mean():.4f} pixels flipped"
    assert np.abs(a[~flipped] - b[~flipped]).max() <= atol


class TestFusedParity:
    def test_cornell_matches_lane(self):
        a, b = _frames(cornell_box())
        _assert_close(a, b)
        assert b.sum() > 1.0  # non-trivial image

    def test_variant_scenes(self):
        for name in ("mirror", "glossy"):
            a, b = _frames(cornell_variant(name))
            _assert_close(a, b)

    def test_sphere_scene(self):
        scene = mixed_scene()  # triangles + spheres + light
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=4 / 3)
        a, b = _frames(scene, cam)
        _assert_close(a, b)

    def test_mesh_scene_with_smooth_normals(self):
        scene = mesh_scene(subdivisions=2)
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=4 / 3)
        a, b = _frames(scene, cam)
        _assert_close(a, b)

    def test_seed_and_shifted_ids(self):
        """RNG parity: a different seed and non-arange ray ids must still
        agree draw-for-draw (bench shifts ids per frame)."""
        scene = cornell_box()
        o, d = CAM.ray_grid(32, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        ids = jnp.arange(o.shape[0], dtype=jnp.uint32) + jnp.uint32(7)
        ref = trace_rays(o, d, scene, ids,
                         RenderConfig(backend="lane", seed=3))
        fus = trace_rays(o, d, scene, ids,
                         RenderConfig(backend="fused", seed=3))
        _assert_close(np.asarray(ref).reshape(24, 32, 3),
                      np.asarray(fus).reshape(24, 32, 3))

    def test_nonmultiple_ray_count(self):
        scene = cornell_box()
        o, d = CAM.ray_grid(33, 17)  # 561 rays, not a tile multiple
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
        out = trace_rays(o, d, scene, ids, RenderConfig(backend="fused"))
        assert out.shape == (561, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestFusedGrad:
    def test_grad_matches_lane_backend(self):
        """jax.grad through backend='fused'/'auto' must equal the lane
        path's gradient exactly: the custom VJP re-derives through the
        XLA pipeline at the same draws."""
        import jax

        from esctp1raytracer_tpu.parallel.sharding import (
            float_params,
            merge_params,
        )

        scene = cornell_box()
        o, d = CAM.ray_grid(16, 12)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
        params = float_params(scene)

        def loss(ps, backend):
            sc = merge_params(scene, ps)
            c = trace_rays(o, d, sc, ids, RenderConfig(backend=backend))
            return jnp.sum(c * c)

        g_lane = jax.grad(lambda ps: loss(ps, "lane"))(params)
        g_fused = jax.grad(lambda ps: loss(ps, "fused"))(params)
        g_auto = jax.grad(lambda ps: loss(ps, "auto"))(params)
        # auto routes to the same custom-VJP program as explicit fused.
        for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_auto)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # vs the pure lane path the cotangent seeds differ by the float
        # rounding of the primal image (sum(c*c) -> ct = 2c), so compare
        # with a rounding-scale tolerance on same-sign dominant entries.
        for a, b in zip(jax.tree.leaves(g_lane), jax.tree.leaves(g_fused)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.maximum(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3)

    def test_auto_routes_small_scene_to_fused(self):
        """backend='auto' on an eligible scene must produce the fused
        kernel's image (bit-equal to an explicit backend='fused' call)."""
        scene = cornell_box()
        a = np.asarray(render(scene, CAM, 32, 24, RenderConfig(backend="fused")))
        b = np.asarray(render(scene, CAM, 32, 24, RenderConfig(backend="auto")))
        np.testing.assert_array_equal(a, b)


class TestFusedDepth:
    """depth > 1: the in-kernel Whitted reflection unroll must equal the
    XLA bounce loop (same draws — streams are (bounce*1024+l)*4+k)."""

    def test_depth2_mirror(self):
        a, b = _frames(cornell_variant("mirror"), depth=2)
        _assert_close(a, b)
        # reflections add light: depth-2 must differ from depth-1
        a1, _ = _frames(cornell_variant("mirror"), depth=1)
        assert np.abs(a - a1).max() > 1e-3

    def test_depth3_mixed_scene(self):
        scene = mixed_scene()
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=4 / 3)
        a, b = _frames(scene, cam, depth=3)
        _assert_close(a, b)

    def test_depth2_grad_auto(self):
        import jax

        from esctp1raytracer_tpu.parallel.sharding import (
            float_params,
            merge_params,
        )

        scene = cornell_variant("mirror")
        o, d = CAM.ray_grid(16, 12)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
        params = float_params(scene)

        def loss(ps, backend):
            sc = merge_params(scene, ps)
            c = trace_rays(o, d, sc, ids,
                           RenderConfig(backend=backend, depth=2))
            return jnp.sum(c * c)

        g_lane = jax.grad(lambda ps: loss(ps, "lane"))(params)
        g_auto = jax.grad(lambda ps: loss(ps, "auto"))(params)
        for a, b in zip(jax.tree.leaves(g_lane), jax.tree.leaves(g_auto)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.maximum(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3)


class TestFusedGate:
    def test_supported_static_gate(self):
        scene = cornell_box()
        assert fused_supported(scene, 1, "area")
        assert fused_supported(scene, 4, "area")
        assert not fused_supported(scene, 5, "area")
        assert not fused_supported(scene, 1, "reference_cpp")
        assert scene.triangles.capacity <= FUSED_TRI_LIMIT

    def test_bwd_cfg_routing(self):
        """The VJP backward re-derivation routes large deep wavefronts
        to chunked mxtile (measured 650 vs 984 ms on config 4, round 5;
        unchunked mxtile OOMs HBM there) and keeps the lane/tile rule
        everywhere else."""
        from esctp1raytracer_tpu.kernels.fused_pallas import _bwd_cfg

        scene = cornell_box()
        big_deep = _bwd_cfg(scene, RenderConfig(depth=4), 2_073_600)
        assert big_deep.backend == "mxtile" and big_deep.ray_chunk == 262_144
        small = _bwd_cfg(scene, RenderConfig(depth=4), 262_144)
        assert small.backend == "lane" and small.ray_chunk == 0
        shallow = _bwd_cfg(scene, RenderConfig(depth=1), 2_073_600)
        assert shallow.backend == "lane"

    def test_fallback_on_unsupported(self):
        """depth=5 (beyond the kernel unroll limit) with backend='fused'
        must fall back to the lane path and equal it exactly (same XLA
        program)."""
        scene = cornell_box()
        a = np.asarray(render(scene, CAM, 32, 24,
                              RenderConfig(backend="lane", depth=5)))
        b = np.asarray(render(scene, CAM, 32, 24,
                              RenderConfig(backend="fused", depth=5)))
        np.testing.assert_array_equal(a, b)

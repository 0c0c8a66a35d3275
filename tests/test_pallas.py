"""Pallas fused closest-hit kernel tests (interpret mode on CPU).

Cross-backend golden equality is the SURVEY.md §4 strategy: the reference
validated its ISPC kernel against the C++ loop by comparing rendered
images; here the Pallas kernel is validated against the jnp search the
same way (plus index-level agreement).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render
from esctp1raytracer_tpu.core.intersect import EPS, argmin_hit
from esctp1raytracer_tpu.kernels.hit_pallas import (
    BLOCK,
    VMEM_TRI_LIMIT,
    pallas_tri_search,
    tri_constants_blocked,
)
from esctp1raytracer_tpu.scene.builders import mesh_scene

CAM = Camera.look_at((0, 1, 2), (0, 1, 0), aspect=1.0)


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


class TestKernel:
    def test_matches_jnp_search(self, cornell):
        o, d = CAM.ray_grid(64, 64)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t1, p1, _ = argmin_hit(o, d, cornell, use_mxu=False)
        t2, p2 = pallas_tri_search(o, d, cornell.triangles, EPS)
        p1, p2 = np.asarray(p1), np.asarray(p2)
        assert (p1 == p2).mean() > 0.998  # borderline eps-window flips only
        same = (p1 == p2) & (p1 >= 0)
        np.testing.assert_allclose(
            np.asarray(t1)[same], np.asarray(t2)[same], rtol=1e-4, atol=1e-5
        )

    def test_mesh_scene_agreement(self):
        scene = mesh_scene(subdivisions=2)  # 320-tri icosphere + ground + light
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        o, d = cam.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        _, p1, _ = argmin_hit(o, d, scene, use_mxu=False)
        _, p2 = pallas_tri_search(o, d, scene.triangles, EPS)
        assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.995

    def test_nonmultiple_ray_count_padding(self, cornell):
        o, d = CAM.ray_grid(33, 17)  # 561 rays, not a tile multiple
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t, p = pallas_tri_search(o, d, cornell.triangles, EPS)
        assert t.shape == (561,)
        assert (np.asarray(p) < 36).all()

    def test_beyond_vmem_capacity_slices_and_matches(self, cornell, monkeypatch):
        """Tables over the VMEM cap sweep in spatial segments and must be
        result-identical to the single resident sweep (incl. tie rule)."""
        from esctp1raytracer_tpu.kernels import hit_pallas
        from esctp1raytracer_tpu.scene.builders import mesh_scene

        scene = mesh_scene(subdivisions=3)  # 1282 tris -> capacity 2048
        o, d = CAM.ray_grid(32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = pallas_tri_search(o, d, scene.triangles, EPS)
        monkeypatch.setattr(hit_pallas, "VMEM_TRI_LIMIT", 1024)
        t_sl, p_sl = pallas_tri_search(o, d, scene.triangles, EPS)
        np.testing.assert_array_equal(np.asarray(p_sl), np.asarray(p_ref))
        np.testing.assert_allclose(np.asarray(t_sl), np.asarray(t_ref),
                                   rtol=0, atol=0)

    def test_tri_constants_shape_and_degenerates(self, cornell):
        tc, aabbs, perm = tri_constants_blocked(cornell.triangles)
        tc = np.asarray(tc)
        npad = tc.shape[1] * BLOCK
        assert tc.shape == (16, npad // BLOCK, 8, 128)
        # valid row marks exactly the real triangles
        assert (tc[12] > 0).sum() == 36
        # perm maps every sorted position to a distinct original triangle
        p = np.asarray(perm)
        assert len(set(p[p >= 0].tolist())) == cornell.num_triangles


class TestRenderBackend:
    def test_render_matches_jnp_backend(self, cornell):
        a = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="jnp")))
        b = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="pallas")))
        diff = np.abs(a - b).max(-1)
        assert (diff > 1e-3).mean() < 0.005
        assert np.median(diff) < 1e-5


class TestLaneKernel:
    """Ray-lane brute-force kernel (kernels/lane_pallas.py) — the small-
    table fast path (every VPU lane a ray, scalar loop over triangles)."""

    def test_matches_jnp_search(self, cornell):
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        o, d = CAM.ray_grid(64, 64)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref, _ = argmin_hit(o, d, cornell, EPS, use_mxu=False)
        t, p = lane_tri_search(o, d, cornell.triangles, EPS)
        # Plane+barycentric constants round differently from direct MT at
        # the eps acceptance window — the standard cross-backend quirk-16
        # tolerance: a handful of borderline flips, identical elsewhere.
        agree = np.asarray(p) == np.asarray(p_ref)
        assert agree.mean() > 0.995
        hit = (np.asarray(p_ref) >= 0) & agree
        np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(t_ref)[hit],
                                   rtol=2e-6)

    def test_nonmultiple_ray_count(self, cornell):
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        o, d = CAM.ray_grid(19, 13)  # 247 rays
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t, p = lane_tri_search(o, d, cornell.triangles, EPS)
        assert t.shape == (247,)
        assert (np.asarray(p) < 36).all()

    def test_capacity_limit(self, cornell):
        import dataclasses

        from esctp1raytracer_tpu.kernels.lane_pallas import (
            LANE_TRI_LIMIT, lane_tri_search)

        big = dataclasses.replace(
            cornell.triangles,
            v0=jnp.zeros((LANE_TRI_LIMIT + 512, 3), jnp.float32),
        )
        with pytest.raises(ValueError):
            lane_tri_search(jnp.zeros((8, 3)), jnp.zeros((8, 3)), big, EPS)

    def test_render_matches_jnp_backend(self, cornell):
        a = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="jnp")))
        b = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="lane")))
        diff = np.abs(a - b).max(-1)
        assert (diff > 1e-3).mean() < 0.005


class TestOcclusionKernel:
    def test_matches_closest_hit_compare(self, cornell):
        from esctp1raytracer_tpu.core.intersect import _sphere_best, argmin_hit
        from esctp1raytracer_tpu.kernels.hit_pallas import (
            pallas_occlusion, pallas_tri_search)

        o, d = CAM.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        # realistic shadow wavefront: from primary hits toward the light
        t, _ = pallas_tri_search(o, d, cornell.triangles, EPS)
        hit = np.asarray(t) < 1e29
        hp = np.asarray(o) + np.asarray(d) * (np.asarray(t)[:, None] - 1e-4)
        p = np.asarray([0.0, 1.97, 0.0], np.float32)
        lv = p - hp
        dist = np.linalg.norm(lv, axis=-1)
        sd = jnp.asarray(lv / np.maximum(dist, 1e-9)[:, None], jnp.float32)
        so = jnp.asarray(hp, jnp.float32)
        tl = jnp.asarray(dist - 1e-4, jnp.float32)

        occ_kernel = np.asarray(pallas_occlusion(so, sd, tl, cornell.triangles, EPS))
        best_t, _ = pallas_tri_search(so, sd, cornell.triangles, EPS)
        occ_compare = np.asarray(best_t) < np.asarray(tl)
        agree = (occ_kernel == occ_compare)[hit]
        assert agree.mean() > 0.999, f"{(~agree).sum()} occlusion flips"

    def test_sliced_occlusion_matches(self, monkeypatch):
        from esctp1raytracer_tpu.kernels import hit_pallas
        from esctp1raytracer_tpu.scene.builders import mesh_scene

        scene = mesh_scene(subdivisions=3)
        o, d = CAM.ray_grid(16, 16)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        tl = jnp.full((o.shape[0],), 10.0, jnp.float32)
        ref = np.asarray(hit_pallas.pallas_occlusion(o, d, tl, scene.triangles, EPS))
        monkeypatch.setattr(hit_pallas, "VMEM_TRI_LIMIT", 1024)
        sliced = np.asarray(hit_pallas.pallas_occlusion(o, d, tl, scene.triangles, EPS))
        np.testing.assert_array_equal(sliced, ref)

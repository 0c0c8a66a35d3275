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

    def test_capacity_limit_raises(self, cornell):
        import dataclasses

        big = dataclasses.replace(
            cornell.triangles,
            v0=jnp.zeros((VMEM_TRI_LIMIT + 512, 3), jnp.float32),
        )
        # capacity comes from v0's leading dim
        o = jnp.zeros((8, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        with pytest.raises(ValueError):
            pallas_tri_search(o, d, big, EPS)

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

"""MXU tile kernel (kernels/rt_mxu.py) vs the VPU tile kernel.

In interpret mode both paths are XLA f32, but through DIFFERENT
formulations (feature matmul vs plane constants), so t values can
differ in last ulps and winners may flip on exact near-ties; the render
comparison is therefore tolerance-based (the same contract the mxu XLA
backend has vs the jnp backend).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu.core.camera import Camera
from esctp1raytracer_tpu.core.intersect import EPS, closest_hit
from esctp1raytracer_tpu.core.render import RenderConfig, render
from esctp1raytracer_tpu.kernels.rt_mxu import (
    mxu_tile_occlusion, mxu_tile_search,
)
from esctp1raytracer_tpu.kernels.rt_tile import tile_occlusion, tile_tri_search
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, cornell_box, icosphere_mesh, scene_from_mesh,
)

CAM = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0, aspect=1.0)
EPS_A = jnp.float32(EPS)


@pytest.fixture(scope="module")
def mesh():
    return scene_from_mesh([
        icosphere_mesh(subdivisions=2, radius=1.0, center=(-1.3, 1.0, 0.0)),
        icosphere_mesh(subdivisions=2, radius=1.0, center=(1.3, 1.0, 0.0),
                       smooth=False),
        _ground_plane(),
        _area_light(center=(0.0, 6.0, 2.0), half=1.5),
    ])


class TestMxuTile:
    def test_search_matches_tile(self, mesh):
        o, d = CAM.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t1, p1 = tile_tri_search(o, d, mesh.triangles, EPS_A)
        t2, p2 = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        t1, p1, t2, p2 = map(np.asarray, (t1, p1, t2, p2))
        same = p1 == p2
        # winner flips only on near-ties (different formulations)
        assert same.mean() > 0.999, f"winner mismatch {1 - same.mean():.4f}"
        rel = np.abs(t1[same] - t2[same]) / np.maximum(np.abs(t1[same]), 1.0)
        # HIGHEST-precision matmul is f32-faithful: last-ulp class only.
        assert rel.max() < 1e-5

    def test_bf16x3_flag_path(self, mesh):
        """SEARCH_BF16X3 exercises the hand-rolled hi/lo split matmul.

        Kept as an option (16% faster sweep on-chip) but off by default:
        its cancellation error flips ~1% of winners (module docstring).
        """
        import esctp1raytracer_tpu.kernels.rt_mxu as m
        o, d = CAM.ray_grid(24, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t1, p1 = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        try:
            m.SEARCH_BF16X3 = True
            t2, p2 = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        finally:
            m.SEARCH_BF16X3 = False
        t1, p1, t2, p2 = map(np.asarray, (t1, p1, t2, p2))
        same = p1 == p2
        assert same.mean() > 0.97  # the bf16x3 error class
        rel = np.abs(t1[same] - t2[same]) / np.maximum(np.abs(t1[same]), 1.0)
        assert rel.max() < 5e-4

    def test_hit_mask_matches(self, mesh):
        o, d = CAM.ray_grid(32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        _, p1 = tile_tri_search(o, d, mesh.triangles, EPS_A)
        _, p2 = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        np.testing.assert_array_equal(np.asarray(p1) >= 0,
                                      np.asarray(p2) >= 0)

    def test_occlusion_matches_tile(self, mesh):
        o, d = CAM.ray_grid(32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        hit = closest_hit(o, d, mesh, EPS_A, tri_search=tile_tri_search)
        t_safe = jnp.where(hit.hit, hit.t, 1.0)[:, None]
        hp = o + d * (t_safe - 1e-4)
        p = jnp.asarray([0.0, 5.9, 2.0], jnp.float32)
        lv = p - hp
        dist = jnp.sqrt(jnp.maximum(jnp.sum(lv * lv, -1), 1e-12))
        sd = lv / dist[:, None]
        tl = jnp.where(hit.hit, dist - 1e-4, -1.0)
        occ1 = np.asarray(tile_occlusion(hp, sd, tl, mesh.triangles, EPS_A))
        occ2 = np.asarray(mxu_tile_occlusion(hp, sd, tl, mesh.triangles,
                                             EPS_A))
        assert (occ1 == occ2).mean() > 0.999

    def test_render_matches_tile_backend(self, mesh):
        a = np.asarray(render(mesh, CAM, 40, 30,
                              RenderConfig(backend="tile")))
        b = np.asarray(render(mesh, CAM, 40, 30,
                              RenderConfig(backend="mxtile")))
        diff = np.abs(a - b)
        assert diff.mean() < 1e-4
        assert (diff > 1e-2).mean() < 5e-3

    def test_cornell_render(self):
        scene = cornell_box()
        cam = Camera.look_at((0.0, 1.0, 2.0), (0.0, 1.0, 0.0), vfov=60.0,
                             aspect=4 / 3)
        a = np.asarray(render(scene, cam, 40, 30,
                              RenderConfig(backend="jnp")))
        b = np.asarray(render(scene, cam, 40, 30,
                              RenderConfig(backend="mxtile")))
        diff = np.abs(a - b)
        assert diff.mean() < 1e-4

    @pytest.mark.parametrize("m_rays", [32, 64, 256])
    def test_ray_tile_m_matches_default(self, mesh, m_rays):
        """Non-default RAY_TILE m (the matmul M dim) must agree with
        m=128 exactly: same formulation, same f32 math, only the ray
        grouping (and thus the per-group cull unions) changes. Covers the
        _prep_mxu reshapes / BlockSpec shapes / kernel m-from-ref-shape
        plumbing at m != 128 in interpret mode (ADVICE r03)."""
        import esctp1raytracer_tpu.kernels.rt_mxu as m
        o, d = CAM.ray_grid(40, 24)  # 960 rays: not a multiple of 256
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        tl = jnp.full((o.shape[0],), 4.0, jnp.float32)
        occ_ref = mxu_tile_occlusion(o, d, tl, mesh.triangles, EPS_A)
        try:
            m.RAY_TILE = m_rays
            t_m, p_m = mxu_tile_search(o, d, mesh.triangles, EPS_A)
            occ_m = mxu_tile_occlusion(o, d, tl, mesh.triangles, EPS_A)
        finally:
            m.RAY_TILE = 128
        np.testing.assert_array_equal(np.asarray(p_m), np.asarray(p_ref))
        np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_ref),
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(occ_m), np.asarray(occ_ref))

    def test_segmented_big_table(self, mesh):
        """Tables above MXU_TRI_LIMIT slice into resident segments."""
        import esctp1raytracer_tpu.kernels.rt_mxu as m
        orig = m.MXU_TRI_LIMIT
        o, d = CAM.ray_grid(24, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        try:
            m.MXU_TRI_LIMIT = 256  # force several segments
            t_sl, p_sl = mxu_tile_search(o, d, mesh.triangles, EPS_A)
        finally:
            m.MXU_TRI_LIMIT = orig
        np.testing.assert_array_equal(np.asarray(p_sl), np.asarray(p_ref))
        np.testing.assert_allclose(np.asarray(t_sl), np.asarray(t_ref),
                                   rtol=0, atol=0)

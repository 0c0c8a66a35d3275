"""Ray x triangle tile kernel tests (interpret mode on CPU).

Same cross-backend strategy as test_pallas.py: the tile kernel must agree
with the jnp search (index-level) and with the bundle kernel it is meant
to replace (exact, both sweep the same Morton-sorted table)."""

import numpy as np
import pytest

import jax.numpy as jnp

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render
from esctp1raytracer_tpu.core.intersect import EPS, argmin_hit
from esctp1raytracer_tpu.kernels.rt_tile import (
    tile_occlusion,
    tile_tri_search,
)
from esctp1raytracer_tpu.scene.builders import mesh_scene

CAM = Camera.look_at((0, 1, 2), (0, 1, 0), aspect=1.0)


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


class TestTileKernel:
    def test_matches_jnp_search(self, cornell):
        o, d = CAM.ray_grid(64, 64)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t1, p1, _ = argmin_hit(o, d, cornell, use_mxu=False)
        t2, p2 = tile_tri_search(o, d, cornell.triangles, EPS)
        p1, p2 = np.asarray(p1), np.asarray(p2)
        assert (p1 == p2).mean() > 0.998  # borderline eps-window flips only
        same = (p1 == p2) & (p1 >= 0)
        np.testing.assert_allclose(
            np.asarray(t1)[same], np.asarray(t2)[same], rtol=1e-4, atol=1e-5
        )

    def test_matches_lane_kernel(self):
        """Lane and tile kernels evaluate the same plane-constant MT
        formulation; winners must agree at non-borderline pixels and the
        agreeing distances bit-compare within f32 rounding. (This was the
        bundle-kernel cross-check before that kernel's round-5 retirement
        — lane serves the same independent-implementation role.)"""
        scene = mesh_scene(subdivisions=2)
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        o, d = cam.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        t1, p1 = lane_tri_search(o, d, scene.triangles, EPS)
        t2, p2 = tile_tri_search(o, d, scene.triangles, EPS)
        p1, p2 = np.asarray(p1), np.asarray(p2)
        agree = p1 == p2
        assert agree.mean() > 0.998
        np.testing.assert_allclose(np.asarray(t1)[agree & (p1 >= 0)],
                                   np.asarray(t2)[agree & (p1 >= 0)],
                                   rtol=2e-6)

    def test_nonmultiple_ray_count(self, cornell):
        o, d = CAM.ray_grid(33, 17)  # 561 rays
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t, p = tile_tri_search(o, d, cornell.triangles, EPS)
        assert t.shape == (561,)
        assert (np.asarray(p) < 36).all()

    def test_sliced_segments_match_resident(self, monkeypatch):
        from esctp1raytracer_tpu.kernels import rt_tile

        scene = mesh_scene(subdivisions=3)  # 1282 tris -> capacity 2048
        o, d = CAM.ray_grid(32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = tile_tri_search(o, d, scene.triangles, EPS)
        monkeypatch.setattr(rt_tile, "TILE_TRI_LIMIT", 1024)
        t_sl, p_sl = tile_tri_search(o, d, scene.triangles, EPS)
        np.testing.assert_array_equal(np.asarray(p_sl), np.asarray(p_ref))
        np.testing.assert_allclose(np.asarray(t_sl), np.asarray(t_ref),
                                   rtol=0, atol=0)

    def test_chunked_prepass_matches_single_shot(self, monkeypatch):
        """Beyond _PREPASS_ELEMS the cull pre-pass streams in lax.map
        chunks (the 4K x 100k-tri HBM-OOM fix); the compacted lists, and
        therefore every result, must be identical to the one-shot path."""
        from esctp1raytracer_tpu.kernels import rt_tile

        scene = mesh_scene(subdivisions=3)
        o, d = CAM.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = tile_tri_search(o, d, scene.triangles, EPS)
        t_lim = jnp.full((o.shape[0],), 2.0, jnp.float32)
        occ_ref = tile_occlusion(o, d, t_lim, scene.triangles, EPS)
        # force ~9 chunks (2304 rays, 16 sub-blocks -> 36864 elems); the
        # jitted wrappers cache on shapes, so drop their executables or
        # the patched global would never be re-read.
        monkeypatch.setattr(rt_tile, "_PREPASS_ELEMS", 4096)
        rt_tile._tile_search.clear_cache()
        rt_tile._tile_occl.clear_cache()
        t_ch, p_ch = tile_tri_search(o, d, scene.triangles, EPS)
        occ_ch = tile_occlusion(o, d, t_lim, scene.triangles, EPS)
        rt_tile._tile_search.clear_cache()
        rt_tile._tile_occl.clear_cache()
        np.testing.assert_array_equal(np.asarray(p_ch), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(t_ch), np.asarray(t_ref))
        np.testing.assert_array_equal(np.asarray(occ_ch), np.asarray(occ_ref))

    def test_coarse_cull_matches_fine(self, monkeypatch):
        """Big tables cull at merged-sub-block granularity (<= _CULL_COLS
        argsort columns) and expand the list x group; winners must equal
        the fine-granularity path exactly (a coarser list is a superset)."""
        from esctp1raytracer_tpu.kernels import rt_tile

        scene = mesh_scene(subdivisions=3)  # capacity 2048 -> 16 sub-blocks
        o, d = CAM.ray_grid(48, 48)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref = tile_tri_search(o, d, scene.triangles, EPS)
        t_lim = jnp.full((o.shape[0],), 2.0, jnp.float32)
        occ_ref = tile_occlusion(o, d, t_lim, scene.triangles, EPS)
        monkeypatch.setattr(rt_tile, "_CULL_COLS", 4)  # force group = 4
        rt_tile._tile_search.clear_cache()
        rt_tile._tile_occl.clear_cache()
        t_co, p_co = tile_tri_search(o, d, scene.triangles, EPS)
        occ_co = tile_occlusion(o, d, t_lim, scene.triangles, EPS)
        rt_tile._tile_search.clear_cache()
        rt_tile._tile_occl.clear_cache()
        np.testing.assert_array_equal(np.asarray(p_co), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(t_co), np.asarray(t_ref))
        np.testing.assert_array_equal(np.asarray(occ_co), np.asarray(occ_ref))

    def test_occlusion_matches_search(self, cornell):
        o, d = CAM.ray_grid(32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_lim = jnp.full((o.shape[0],), 1.5, jnp.float32)
        occ = tile_occlusion(o, d, t_lim, cornell.triangles, EPS)
        t, _ = tile_tri_search(o, d, cornell.triangles, EPS)
        np.testing.assert_array_equal(np.asarray(occ),
                                      np.asarray(t) < 1.5)

    def test_render_backend(self, cornell):
        a = np.asarray(render(cornell, CAM, 32, 24,
                              RenderConfig(backend="lane")))
        b = np.asarray(render(cornell, CAM, 32, 24,
                              RenderConfig(backend="tile")))
        diff = np.abs(a - b).max(axis=-1)
        assert (diff > 1e-2).mean() < 2e-3  # borderline flips only

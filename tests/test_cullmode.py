"""Cull pre-pass modes: interval mask conservativeness, extraction
compaction exactness + overflow fallback, and winner parity across
argsort / exact / interval (round-4 pre-pass rework)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu import Camera
from esctp1raytracer_tpu.kernels import rt_mxu, rt_tile
from esctp1raytracer_tpu.kernels.hit_pallas import (
    block_cull_mask,
    extract_lists,
    group_cull_mask,
)
from esctp1raytracer_tpu.scene import builders

EPS = jnp.float32(np.finfo(np.float32).eps)


@pytest.fixture(scope="module")
def mesh():
    return builders.mesh_scene(3)  # 1280+2+2 tris


@pytest.fixture(scope="module")
def rays():
    cam = Camera.look_at((0, 2, 6), (0, 1, 0), vfov=60.0, aspect=1.0)
    o, d = cam.ray_grid(32, 16)
    return o.reshape(-1, 3), d.reshape(-1, 3)


class TestGroupCullMask:
    def test_conservative_vs_per_ray(self, mesh, rays):
        """The interval mask must be a superset of the exact 8-ray OR."""
        o, d = rays
        from esctp1raytracer_tpu.kernels.rt_tile import tri_constants_sub
        _, aabbs, *_ = tri_constants_sub(mesh.triangles)
        ns = aabbs.shape[1]
        exact = np.asarray(jnp.any(
            block_cull_mask(o, d, aabbs, None).reshape(-1, 8, ns), axis=1))
        hull = np.asarray(group_cull_mask(o, d, aabbs, None, group=8))
        assert not (exact & ~hull).any(), "interval mask dropped a block"

    def test_conservative_with_t_limit(self, mesh, rays):
        o, d = rays
        from esctp1raytracer_tpu.kernels.rt_tile import tri_constants_sub
        _, aabbs, *_ = tri_constants_sub(mesh.triangles)
        ns = aabbs.shape[1]
        tl = jnp.where(jnp.arange(o.shape[0]) % 3 == 0, -1.0, 4.0
                       ).astype(jnp.float32)
        exact = np.asarray(jnp.any(
            block_cull_mask(o, d, aabbs, tl).reshape(-1, 8, ns), axis=1))
        hull = np.asarray(group_cull_mask(o, d, aabbs, tl, group=8))
        assert not (exact & ~hull).any()

    def test_incoherent_origins_stay_conservative(self, mesh):
        """Scattered origins (shadow-like wavefront): never drops blocks."""
        rng = np.random.default_rng(0)
        o = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        from esctp1raytracer_tpu.kernels.rt_tile import tri_constants_sub
        _, aabbs, *_ = tri_constants_sub(mesh.triangles)
        ns = aabbs.shape[1]
        exact = np.asarray(jnp.any(
            block_cull_mask(o, d, aabbs, None).reshape(-1, 8, ns), axis=1))
        hull = np.asarray(group_cull_mask(o, d, aabbs, None, group=8))
        assert not (exact & ~hull).any()


class TestExtractLists:
    def test_matches_argsort(self):
        rng = np.random.default_rng(1)
        gm = jnp.asarray(rng.random((40, 96)) < 0.1)
        ids, cnt = extract_lists(gm, k=32)
        ref_ids = jnp.argsort(~gm, axis=1, stable=True).astype(jnp.int32)
        ref_cnt = jnp.sum(gm, axis=1).astype(jnp.int32)
        cnt_n, ref_cnt_n = np.asarray(cnt), np.asarray(ref_cnt)
        assert (cnt_n == ref_cnt_n).all()
        ids_n, ref_n = np.asarray(ids), np.asarray(ref_ids)
        for r in range(gm.shape[0]):
            np.testing.assert_array_equal(ids_n[r, :cnt_n[r]],
                                          ref_n[r, :cnt_n[r]])

    def test_overflow_falls_back_dense(self):
        """cnt > k rows must sweep everything (ids = iota, cnt = NB)."""
        gm = jnp.ones((3, 64), bool)
        ids, cnt = extract_lists(gm, k=8)
        assert (np.asarray(cnt) == 64).all()
        np.testing.assert_array_equal(np.asarray(ids),
                                      np.tile(np.arange(64), (3, 1)))

    def test_k_clamped_to_width(self):
        gm = jnp.asarray(np.eye(4, dtype=bool))
        ids, cnt = extract_lists(gm, k=32)  # k > NB=4
        assert (np.asarray(cnt) == 1).all()
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(4))


class TestModeParity:
    @pytest.mark.parametrize("mode", ["exact", "interval"])
    def test_tile_winner_parity(self, mesh, rays, mode):
        o, d = rays
        old = rt_tile.CULL_MODE
        try:
            rt_tile.CULL_MODE = "argsort"
            t_ref, p_ref = rt_tile.tile_tri_search(o, d, mesh.triangles, EPS,
                                                   coherent=True)
            rt_tile.CULL_MODE = mode
            t_m, p_m = rt_tile.tile_tri_search(o, d, mesh.triangles, EPS,
                                               coherent=True)
        finally:
            rt_tile.CULL_MODE = old
        np.testing.assert_array_equal(np.asarray(p_m), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_ref))

    @pytest.mark.parametrize("mode", ["exact", "interval"])
    def test_mxu_occl_parity(self, mesh, rays, mode):
        o, d = rays
        tl = jnp.full((o.shape[0],), 4.0, jnp.float32)
        old = rt_mxu.CULL_MODE
        try:
            rt_mxu.CULL_MODE = "argsort"
            ref = rt_mxu.mxu_tile_occlusion(o, d, tl, mesh.triangles, EPS)
            rt_mxu.CULL_MODE = mode
            got = rt_mxu.mxu_tile_occlusion(o, d, tl, mesh.triangles, EPS)
        finally:
            rt_mxu.CULL_MODE = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.parametrize("period", [1, 8])
    def test_occl_early_exit_parity(self, mesh, period):
        """OCCL_EARLY_EXIT (entry-ordered lists + chunked while_loop) is
        answer-identical to the production fori sweep — kept off by
        default as a measured on-chip negative (ROOFLINE r4), so the
        parity guard is what keeps the machinery honest."""
        rng = np.random.default_rng(3)
        o = jnp.asarray(rng.uniform(-2, 2, (128, 3)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        tl = jnp.asarray(np.where(rng.random(128) < 0.2, -1.0,
                                  rng.uniform(0.5, 6.0, 128)
                                  ).astype(np.float32))
        old = rt_tile.OCCL_EARLY_EXIT
        try:
            rt_tile.OCCL_EARLY_EXIT = 0
            ref = rt_tile.tile_occlusion(o, d, tl, mesh.triangles, EPS)
            rt_tile.OCCL_EARLY_EXIT = period
            got = rt_tile.tile_occlusion(o, d, tl, mesh.triangles, EPS)
        finally:
            rt_tile.OCCL_EARLY_EXIT = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_auto_resolution(self):
        # auto = argsort everywhere: the interval/extraction pre-pass is
        # a measured end-to-end negative (heavy-tailed list lengths; see
        # rt_tile.CULL_MODE). The override keeps the modes selectable.
        assert rt_tile._resolve_cull_mode(True, 784) == "argsort"
        assert rt_tile._resolve_cull_mode(False, 784) == "argsort"
        assert rt_mxu._resolve_cull_mode(True, 256) == "argsort"
        old = rt_tile.CULL_MODE
        try:
            rt_tile.CULL_MODE = "interval"
            assert rt_tile._resolve_cull_mode(False, 84) == "interval"
        finally:
            rt_tile.CULL_MODE = old

"""Acceleration-structure tests: AABB slab test, Morton clusters, BVH
(numpy and native builders), and agreement with brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from esctp1raytracer_tpu import Camera, cornell_box
from esctp1raytracer_tpu.accel.aabb import aabb_intersect, triangle_bounds
from esctp1raytracer_tpu.accel.bvh import build_bvh
from esctp1raytracer_tpu.accel.clusters import build_clusters, cluster_table, morton_codes
from esctp1raytracer_tpu.accel.native_bvh import native_bvh_available
from esctp1raytracer_tpu.core.intersect import argmin_hit
from esctp1raytracer_tpu.scene.builders import mesh_scene

CAM = Camera.look_at((0, 1, 2), (0, 1, 0), aspect=1.0)


class TestAABB:
    def test_hit_and_miss(self):
        o = jnp.asarray([0.0, 0.0, 5.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        inv = 1.0 / d
        tn, tf, hit = aabb_intersect(o, inv, jnp.asarray([-1.0, -1, -1]),
                                     jnp.asarray([1.0, 1, 1]))
        assert bool(hit) and np.isclose(float(tn), 4.0) and np.isclose(float(tf), 6.0)
        _, _, miss = aabb_intersect(
            jnp.asarray([5.0, 5.0, 5.0]), inv,
            jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
        assert not bool(miss)

    def test_origin_inside(self):
        o = jnp.zeros(3)
        inv = 1.0 / jnp.asarray([0.0, 0.0, -1.0])  # inf components are fine
        tn, tf, hit = aabb_intersect(o, inv, jnp.asarray([-1.0, -1, -1]),
                                     jnp.asarray([1.0, 1, 1]))
        assert bool(hit) and float(tf) >= 0

    def test_triangle_bounds(self):
        scene = cornell_box()
        bmin, bmax = triangle_bounds(scene.triangles)
        valid = np.asarray(scene.triangles.valid)
        assert (np.asarray(bmin)[valid] <= np.asarray(bmax)[valid]).all()


class TestClusters:
    def test_morton_orders_locally(self):
        pts = jnp.asarray([[0, 0, 0], [0.01, 0, 0], [1, 1, 1]], jnp.float32)
        codes = np.asarray(morton_codes(pts))
        assert codes[0] <= codes[1] <= codes[2]

    def test_build_preserves_triangles(self):
        scene = mesh_scene(subdivisions=2)
        cl = build_clusters(scene.triangles)
        perm = np.asarray(cl.perm)
        assert sorted(perm.tolist()) == list(range(scene.num_triangles))
        # sorted buffer is a permutation of the original
        np.testing.assert_allclose(
            np.asarray(cl.tris.v0), np.asarray(scene.triangles.v0)[perm]
        )
        # every valid triangle is inside its cluster box
        bmin, bmax = triangle_bounds(cl.tris)
        c = cl.num_clusters
        bmin = np.asarray(bmin).reshape(c, -1, 3)
        bmax = np.asarray(bmax).reshape(c, -1, 3)
        valid = np.asarray(cl.tris.valid).reshape(c, -1)
        cmin = np.asarray(cl.cluster_min)[:, None]
        cmax = np.asarray(cl.cluster_max)[:, None]
        assert np.all((bmin >= cmin - 1e-5) | ~valid[..., None])
        assert np.all((bmax <= cmax + 1e-5) | ~valid[..., None])

    def test_invalid_clusters_never_hit(self):
        scene = cornell_box()  # 36 valid of 512 -> mostly-padded clusters
        cl = build_clusters(scene.triangles)
        cmin, cmax = np.asarray(cl.cluster_min), np.asarray(cl.cluster_max)
        empty = cmin > cmax  # inverted boxes
        assert empty.any()

    def test_table_shape(self):
        cl = build_clusters(cornell_box().triangles)
        tab = np.asarray(cluster_table(cl))
        assert tab.shape == (8, cl.num_clusters)


class TestBVH:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_matches_bruteforce(self, use_native):
        if use_native and not native_bvh_available():
            pytest.skip("no native BVH")
        scene = mesh_scene(subdivisions=2)
        bvh = build_bvh(scene.triangles, use_native=use_native)
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        o, d = cam.ray_grid(12, 12)
        o, d = np.asarray(o.reshape(-1, 3)), np.asarray(d.reshape(-1, 3))
        t_ref, p_ref, _ = argmin_hit(jnp.asarray(o), jnp.asarray(d), scene)
        t_ref, p_ref = np.asarray(t_ref), np.asarray(p_ref)
        for i in range(o.shape[0]):
            t, p = bvh.intersect(o[i], d[i])
            assert p == p_ref[i], i
            if p >= 0:
                assert abs(t - t_ref[i]) < 1e-4

    def test_leaf_ranges_cover_all(self):
        scene = cornell_box()
        bvh = build_bvh(scene.triangles, use_native=False)
        leaves = bvh.left < 0
        covered = np.zeros(36, bool)
        for s, c in zip(bvh.start[leaves], bvh.count[leaves]):
            covered[s:s + c] = True
        assert covered.all()

    @pytest.mark.skipif(not native_bvh_available(), reason="no native BVH")
    def test_native_matches_numpy(self):
        scene = mesh_scene(subdivisions=2)
        a = build_bvh(scene.triangles, use_native=False)
        b = build_bvh(scene.triangles, use_native=True)
        assert a.num_nodes == b.num_nodes
        np.testing.assert_array_equal(a.order, b.order)
        np.testing.assert_allclose(a.bmin, b.bmin, atol=1e-6)
        np.testing.assert_array_equal(a.left, b.left)


class TestOversizeMedian:
    def test_padding_does_not_skew_median(self):
        """The oversize threshold must use the median over VALID slots: a
        36-valid / 512-capacity Cornell buffer previously computed median
        0 (zero-filled padding) and flagged every triangle oversized."""
        from esctp1raytracer_tpu import cornell_box

        scene = cornell_box()
        assert scene.triangles.capacity >= 2 * int(scene.triangles.valid.sum())
        cl = build_clusters(scene.triangles)
        over = np.asarray(cl.oversized)
        valid = np.asarray(cl.tris.valid)
        frac = over[valid].mean() if valid.any() else 0.0
        # Cornell walls/floor are all the same scale; only a small
        # minority (e.g. the large floor/ceiling quads) may be oversized.
        assert frac < 0.5, f"{frac:.2f} of valid triangles flagged oversized"

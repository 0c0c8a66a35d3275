"""Unit tests for intersection primitives.

The math-primitive tests play the role the reference's (vestigial) ISPC
self-test intended (src/ispc/test.ispc:22-38, commented out of the build);
the Möller–Trumbore acceptance-window tests pin the reference semantics of
src/scene/ray_triangle.h:7-57 including quirk 16 (u,v >= eps rejection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu.core.intersect import (
    BIG,
    EPS,
    any_hit,
    argmin_hit,
    closest_hit,
    hits_from_features,
    mt_intersect,
    ray_features,
    sphere_intersect,
    tri_features,
)
from esctp1raytracer_tpu.scene.builders import cornell_box, make_spheres, scene_from_mesh
from esctp1raytracer_tpu.scene.types import Material, MeshData, SphereBuffer


def _tri(v0, v1, v2):
    return (jnp.asarray(v0, jnp.float32), jnp.asarray(v1, jnp.float32),
            jnp.asarray(v2, jnp.float32))


class TestMollerTrumbore:
    def test_direct_hit(self):
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([0.25, 0.25, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        t, u, v, ok = mt_intersect(o, d, v0, v1, v2)
        assert bool(ok)
        assert np.isclose(float(t), 1.0, atol=1e-6)
        assert np.isclose(float(u), 0.25, atol=1e-6)
        assert np.isclose(float(v), 0.25, atol=1e-6)

    def test_miss_outside(self):
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([2.0, 2.0, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        t, _, _, ok = mt_intersect(o, d, v0, v1, v2)
        assert not bool(ok)
        assert float(t) == pytest.approx(float(BIG))

    def test_parallel_ray_rejected(self):
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([0.25, 0.25, 1.0])
        d = jnp.asarray([1.0, 0.0, 0.0])  # parallel to the plane
        _, _, _, ok = mt_intersect(o, d, v0, v1, v2)
        assert not bool(ok)

    def test_behind_origin_rejected(self):
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([0.25, 0.25, -1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        _, _, _, ok = mt_intersect(o, d, v0, v1, v2)
        assert not bool(ok)

    def test_eps_window_rejects_exact_edge(self):
        # Reference quirk 16: u < eps is a miss, so a ray exactly through
        # the v0-v2 edge (u = 0) is rejected.
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([0.0, 0.5, 1.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        _, _, _, ok = mt_intersect(o, d, v0, v1, v2)
        assert not bool(ok)

    def test_backface_hit_allowed(self):
        # No backface culling in the reference: negative det still hits.
        v0, v1, v2 = _tri((0, 0, 0), (1, 0, 0), (0, 1, 0))
        o = jnp.asarray([0.25, 0.25, -1.0])
        d = jnp.asarray([0.0, 0.0, 1.0])
        t, _, _, ok = mt_intersect(o, d, v0, v1, v2)
        assert bool(ok)
        assert np.isclose(float(t), 1.0, atol=1e-6)


class TestFeatureMatmul:
    def test_matches_direct_mt(self):
        rng = np.random.RandomState(0)
        r, b = 64, 32
        o = jnp.asarray(rng.randn(r, 3), jnp.float32)
        d = rng.randn(r, 3)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
        v0 = jnp.asarray(rng.randn(b, 3), jnp.float32)
        v1 = jnp.asarray(rng.randn(b, 3), jnp.float32)
        v2 = jnp.asarray(rng.randn(b, 3), jnp.float32)

        t1, u1, v1_, ok1 = mt_intersect(
            o[:, None, :], d[:, None, :], v0[None], v1[None], v2[None]
        )
        rf = ray_features(o, d)
        tf = tri_features(v0, v1, v2)
        t2, u2, v2_, ok2 = hits_from_features(rf, tf)

        ok1, ok2 = np.asarray(ok1), np.asarray(ok2)
        # Acceptance can differ only in an eps-neighborhood of thresholds.
        agree = ok1 == ok2
        assert agree.mean() > 0.999
        both = ok1 & ok2
        np.testing.assert_allclose(
            np.asarray(t1)[both], np.asarray(t2)[both], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(u1)[both], np.asarray(u2)[both], rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(v1_)[both], np.asarray(v2_)[both], rtol=1e-3, atol=1e-4
        )


class TestSphere:
    def test_hit_outside(self):
        o = jnp.asarray([0.0, 0.0, 3.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        t, ok = sphere_intersect(o, d, jnp.zeros(3), jnp.asarray(1.0))
        assert bool(ok)
        assert np.isclose(float(t), 2.0, atol=1e-5)

    def test_hit_inside_takes_far_root(self):
        o = jnp.zeros(3)
        d = jnp.asarray([0.0, 0.0, -1.0])
        t, ok = sphere_intersect(o, d, jnp.zeros(3), jnp.asarray(1.0))
        assert bool(ok)
        assert np.isclose(float(t), 1.0, atol=1e-5)

    def test_miss(self):
        o = jnp.asarray([0.0, 5.0, 3.0])
        d = jnp.asarray([0.0, 0.0, -1.0])
        _, ok = sphere_intersect(o, d, jnp.zeros(3), jnp.asarray(1.0))
        assert not bool(ok)

    def test_behind(self):
        o = jnp.asarray([0.0, 0.0, 3.0])
        d = jnp.asarray([0.0, 0.0, 1.0])
        _, ok = sphere_intersect(o, d, jnp.zeros(3), jnp.asarray(1.0))
        assert not bool(ok)


def _two_plane_scene():
    """Two parallel unit quads at z=-1 (front) and z=-2 (back)."""
    mat = Material.make(kd=(1, 0, 0))
    quads = []
    for name, z in (("front", -1.0), ("back", -2.0)):
        q = np.asarray(
            [(-1, -1, z), (1, -1, z), (1, 1, z), (-1, 1, z)], np.float32
        )
        tris = np.stack([q[[0, 1, 2]], q[[0, 2, 3]]])
        quads.append(MeshData(name=name, vertices=tris, normals=None, uv=None, material=mat))
    return scene_from_mesh(quads)


class TestClosestHit:
    @pytest.mark.parametrize("use_mxu", [False, True])
    def test_nearest_wins(self, use_mxu):
        scene = _two_plane_scene()
        o = jnp.asarray([[0.3, 0.2, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = closest_hit(o, d, scene, use_mxu=use_mxu)
        assert bool(hit.hit[0])
        assert np.isclose(float(hit.t[0]), 2.0, atol=1e-5)  # front plane
        assert int(jnp.take(scene.triangles.geom_id, hit.prim[0])) == 0

    @pytest.mark.parametrize("use_mxu", [False, True])
    def test_tie_takes_first_index(self, use_mxu):
        # Duplicate triangle: the strict < keeps the lower index, matching
        # the reference's t2 >= t rejection.
        mat = Material.make(kd=(1, 1, 1))
        tri = np.asarray([[(-1, -1, -1), (1, -1, -1), (0, 1, -1)]], np.float32)
        meshes = [
            MeshData(name="a", vertices=tri, normals=None, uv=None, material=mat),
            MeshData(name="b", vertices=tri.copy(), normals=None, uv=None, material=mat),
        ]
        scene = scene_from_mesh(meshes)
        o = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = closest_hit(o, d, scene, use_mxu=use_mxu)
        assert int(hit.prim[0]) == 0

    def test_sphere_beats_farther_triangle(self):
        scene = _two_plane_scene()
        spheres = make_spheres([(0.0, 0.0, 0.0)], [0.5], [Material.make(kd=(0, 1, 0))])
        scene = scene.__class__(triangles=scene.triangles, spheres=spheres, lights=scene.lights)
        o = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = closest_hit(o, d, scene)
        assert bool(hit.is_sphere[0])
        assert np.isclose(float(hit.t[0]), 0.5, atol=1e-5)

    def test_miss_is_flagged(self):
        scene = _two_plane_scene()
        o = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        hit = closest_hit(o, d, scene)
        assert not bool(hit.hit[0])
        assert int(hit.prim[0]) == -1


class TestAnyHit:
    def test_occluded_and_clear(self):
        # Probe point (0.3, 0.2) sits off the quads' triangulation
        # diagonal — rays exactly on the diagonal fall in the reference's
        # eps miss band (quirk 16).
        scene = _two_plane_scene()
        o = jnp.asarray([[0.3, 0.2, 1.0], [0.3, 0.2, 1.0], [1.5, 1.5, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 3, jnp.float32)
        t_limit = jnp.asarray([5.0, 1.5, 5.0], jnp.float32)
        occ = any_hit(o, d, t_limit, scene)
        assert bool(occ[0])  # front plane at t=2 < 5
        assert not bool(occ[1])  # nothing before t=1.5
        assert not bool(occ[2])  # ray misses both quads

    def test_padded_triangles_never_hit(self):
        scene = cornell_box()
        # Rays from inside the box must only ever hit real triangles
        # (prim < 36). The Cornell box is open at the front (+z), so only
        # rays pointed into the box are required to hit; the tiny eps seam
        # along quad diagonals (quirk 16) allows rare misses.
        rng = np.random.RandomState(1)
        d = rng.randn(512, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = d[d[:, 2] < -0.3]
        o = np.tile([[0.0, 1.0, 0.5]], (len(d), 1))
        hit = closest_hit(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), scene)
        prim = np.asarray(hit.prim)
        hits = np.asarray(hit.hit)
        assert (prim[hits] < 36).all()
        assert hits.mean() > 0.98

"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins one of the five fixes:
  1. NaN-safe slab culling in the Pallas pre-pass (axis-aligned rays on a
     block AABB plane must not be culled);
  2. closest_hit recompute fallback when the backend search accepts a
     borderline winner the recompute rejects;
  3. 'prims' mesh-axis divisibility guard (silent triangle loss);
  4. light_mode="reference_cpp" corner mapping for lights with >3 corners
     (quirk 2, reference src/main.cpp:748-754 over the de-indexed array);
  5. Adam state in checkpoints: resume must continue the exact trajectory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu import Camera, RenderConfig, render
from esctp1raytracer_tpu.core.intersect import BIG, EPS, closest_hit
from esctp1raytracer_tpu.core.shading import sample_lights
from esctp1raytracer_tpu.grad import fit_scene
from esctp1raytracer_tpu.scene.builders import scene_from_mesh, sphere_plane_scene
from esctp1raytracer_tpu.scene.types import Material, MeshData


def _tri_scene(faces: np.ndarray, material: Material = None) -> "Scene":
    mesh = MeshData(
        name="t",
        vertices=np.asarray(faces, np.float32),
        normals=None,
        uv=None,
        material=material or Material.make(kd=(1, 1, 1)),
    )
    return scene_from_mesh([mesh])


class TestNaNCull:
    """A zero direction component with the origin exactly on a slab plane
    produces 0 * inf = NaN in the pre-pass; the mask must conservatively
    KEEP such blocks (a grazing hit can be accepted under f32 rounding)."""

    AABBS = jnp.asarray(
        [[-2.0], [0.0], [-2.0], [2.0], [0.0], [2.0], [0.0], [0.0]],
        jnp.float32,
    )  # one block: x/z in [-2, 2], y flat at 0

    def test_nan_lane_is_kept(self):
        from esctp1raytracer_tpu.kernels.cull import block_cull_mask

        # o.x == bmax.x == 2 with d.x == 0 -> NaN lane; ray otherwise
        # passes straight down through the box.
        o = jnp.asarray([[2.0, 1.0, 0.5]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        mask = block_cull_mask(o, d, self.AABBS)
        assert bool(mask[0, 0])

    def test_normal_hit_and_miss_unchanged(self):
        from esctp1raytracer_tpu.kernels.cull import block_cull_mask

        o = jnp.asarray(
            [[0.0, 1.0, 0.0], [5.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32
        )
        d = jnp.asarray(
            [[0.0, -1.0, 0.0], [0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32
        )
        mask = block_cull_mask(o, d, self.AABBS)
        assert bool(mask[0, 0])       # through the box
        assert not bool(mask[1, 0])   # beside the box
        assert not bool(mask[2, 0])   # box behind the origin

    def test_t_limit_culls_far_blocks(self):
        from esctp1raytracer_tpu.kernels.cull import block_cull_mask

        o = jnp.asarray([[0.0, 10.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        near = block_cull_mask(o, d, self.AABBS, jnp.asarray([11.0]))
        far = block_cull_mask(o, d, self.AABBS, jnp.asarray([5.0]))
        assert bool(near[0, 0])
        assert not bool(far[0, 0])  # slab entry at t=10 > limit 5


class TestRecomputeFallback:
    def test_borderline_winner_keeps_search_t(self):
        faces = np.asarray([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
        scene = _tri_scene(faces)
        # A ray that misses the triangle entirely; a fake backend search
        # claims index 0 at t=2.5 (standing in for a borderline rounding
        # disagreement). The recompute must fall back to the search's t
        # rather than leave the hit point at BIG.
        o = jnp.asarray([[5.0, 5.0, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)

        def fake_search(oo, dd, tris, eps, t_limit=None):
            return (jnp.full((1,), 2.5, jnp.float32),
                    jnp.zeros((1,), jnp.int32))

        hit = closest_hit(o, d, scene, jnp.float32(EPS), tri_search=fake_search)
        assert bool(hit.hit[0])
        assert float(hit.t[0]) == pytest.approx(2.5)
        assert float(hit.t[0]) < float(BIG)


class TestPrimAxisDivisibility:
    def test_nondivisible_capacity_raises(self):
        if jax.device_count() < 6:
            pytest.skip("needs 6 virtual devices")
        from esctp1raytracer_tpu.parallel.sharding import make_mesh, render_sharded

        scene = sphere_plane_scene()  # capacity 512, not divisible by 3
        mesh = make_mesh(jax.devices()[:6], rays=2, prims=3)
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        with pytest.raises(ValueError, match="not divisible"):
            jax.block_until_ready(
                render_sharded(scene, cam, 16, 16, RenderConfig(), mesh)
            )


class TestReferenceCppCorners:
    def test_four_face_light_samples_later_faces(self):
        # Light with 4 faces (12 corners): the reference reads
        # light.vertex[faceID] for faceID in [0, 4) -> corners
        # {f0c0, f0c1, f0c2, f1c0}. The old emulation clamped every
        # faceID >= 2 to corner 2 of face 0.
        quad = np.asarray(
            [
                [[0.0, 5.0, 0.0], [1.0, 5.0, 0.0], [0.0, 5.0, 1.0]],
                [[9.0, 5.0, 9.0], [8.0, 5.0, 9.0], [9.0, 5.0, 8.0]],
                [[4.0, 5.0, 4.0], [5.0, 5.0, 4.0], [4.0, 5.0, 5.0]],
                [[7.0, 5.0, 1.0], [6.0, 5.0, 1.0], [7.0, 5.0, 2.0]],
            ],
            np.float32,
        )
        light = MeshData(
            name="light", vertices=quad, normals=None, uv=None,
            material=Material.make(ke=(10, 10, 10)),
        )
        floor = MeshData(
            name="floor",
            vertices=np.asarray(
                [[[-9, 0, -9], [9, 0, -9], [0, 0, 9]]], np.float32
            ),
            normals=None, uv=None, material=Material.make(kd=(1, 1, 1)),
        )
        scene = scene_from_mesh([floor, light])
        ids = jnp.arange(4096, dtype=jnp.uint32)
        p, _, L = sample_lights(scene, seed=0, ray_ids=ids, mode="reference_cpp")
        assert L == 1
        pts = np.unique(np.asarray(p).reshape(-1, 3), axis=0)
        expected = np.asarray(
            [quad[0, 0], quad[0, 1], quad[0, 2], quad[1, 0]], np.float32
        )
        expected = np.unique(expected, axis=0)
        assert pts.shape == expected.shape
        np.testing.assert_allclose(
            pts, np.asarray(sorted(expected.tolist())), atol=0
        )


class TestAdamResume:
    def test_resume_continues_exact_trajectory(self, tmp_path):
        scene = sphere_plane_scene()
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        cfg = RenderConfig()
        target = render(scene, cam, 24, 24, cfg)
        perturbed = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(scene.spheres, kd=scene.spheres.kd * 0.4),
        )
        # Uninterrupted 6 steps.
        full = fit_scene(perturbed, target, cam, steps=6, lr=0.05, cfg=cfg,
                         log_every=0)
        # 3 steps + checkpoint, then resume to 6.
        path = str(tmp_path / "ck.npz")
        fit_scene(perturbed, target, cam, steps=3, lr=0.05, cfg=cfg,
                  checkpoint_path=path, checkpoint_every=100, log_every=0)
        resumed = fit_scene(perturbed, target, cam, steps=6, lr=0.05, cfg=cfg,
                            checkpoint_path=path, checkpoint_every=100,
                            log_every=0)
        assert resumed.steps == 3
        for a, b in zip(jax.tree.leaves(full.scene), jax.tree.leaves(resumed.scene)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )


class TestUVCarriedThrough:
    def test_obj_uv_lands_in_triangle_buffer(self, tmp_path):
        from esctp1raytracer_tpu.scene.objloader import load_obj

        p = tmp_path / "uv.obj"
        p.write_text(
            "mtllib none.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vt 0.1 0.2\nvt 0.9 0.2\nvt 0.1 0.8\n"
            "f 1/1 2/2 3/3\n"
        )
        meshes = load_obj(str(p))
        scene = scene_from_mesh(meshes)
        tb = scene.triangles
        assert bool(tb.has_uv[0])
        np.testing.assert_allclose(np.asarray(tb.uv0[0]), [0.1, 0.2], atol=1e-7)
        np.testing.assert_allclose(np.asarray(tb.uv1[0]), [0.9, 0.2], atol=1e-7)
        np.testing.assert_allclose(np.asarray(tb.uv2[0]), [0.1, 0.8], atol=1e-7)
        assert not bool(tb.has_uv[1])  # padding

    def test_trace_level_prints_hit_summary(self, capfd):
        from esctp1raytracer_tpu.utils import debug

        scene = sphere_plane_scene()
        cam = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
        debug.set_level(debug.TRACE)
        try:
            jax.block_until_ready(render(scene, cam, 8, 8, RenderConfig()))
        finally:
            debug.set_level(debug.INFO)
        out = capfd.readouterr()
        assert "trace[bounce 0]: hits=" in out.out + out.err

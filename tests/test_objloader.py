"""OBJ/MTL loader tests — semantics parity with the reference loader
(model::loadobj, reference src/scene/sceneloader.cpp:14-106)."""

import os

import numpy as np
import pytest

from esctp1raytracer_tpu.scene.builders import (
    cornell_box,
    cornell_meshes,
    scene_from_mesh,
    write_cornell_obj,
)
from esctp1raytracer_tpu.scene.objloader import load_mtl, load_obj


@pytest.fixture()
def cornell_obj(tmp_path):
    path = str(tmp_path / "cornell.obj")
    write_cornell_obj(path)
    return path


class TestMtl:
    def test_parse_fields(self, tmp_path):
        p = tmp_path / "m.mtl"
        p.write_text(
            "newmtl red\nNs 10.0\nNi 1.5\nillum 2\n"
            "Ka 0.63 0.065 0.05 # comment\nKd 0.6 0.1 0.1\nKs 0 0 0\nKe 0 0 0\n"
            "newmtl lamp\nKe 17 12 4\n"
        )
        mats = load_mtl(str(p))
        assert set(mats) == {"red", "lamp"}
        np.testing.assert_allclose(mats["red"].ka, [0.63, 0.065, 0.05])
        assert mats["red"].ns == 10.0
        assert not mats["red"].is_light
        assert mats["lamp"].is_light  # dot(ke,ke) > 0 rule


class TestObj:
    def test_cornell_roundtrip(self, cornell_obj):
        meshes = load_obj(cornell_obj)
        total = sum(m.num_faces for m in meshes)
        assert total == 36  # 18 quads fan-triangulated
        lights = [m for m in meshes if m.material.is_light]
        assert len(lights) == 1
        assert lights[0].num_faces == 2

    def test_negative_and_positive_indices(self, tmp_path):
        p = tmp_path / "t.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
            "v 0 0 1\nv 1 0 1\nv 0 1 1\nf -3 -2 -1\n"
        )
        meshes = load_obj(str(p))
        total = sum(m.num_faces for m in meshes)
        assert total == 2
        verts = np.concatenate([m.vertices for m in meshes])
        assert verts[1][0][2] == 1.0  # second face used the later vertices

    def test_quad_fan_triangulation(self, tmp_path):
        p = tmp_path / "q.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        (mesh,) = load_obj(str(p))
        assert mesh.num_faces == 2
        np.testing.assert_allclose(mesh.vertices[0], [(0, 0, 0), (1, 0, 0), (1, 1, 0)])
        np.testing.assert_allclose(mesh.vertices[1], [(0, 0, 0), (1, 1, 0), (0, 1, 0)])

    def test_normals_deindexed_and_normalized(self, tmp_path):
        p = tmp_path / "n.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vn 0 0 2\n"  # un-normalized on purpose
            "f 1//1 2//1 3//1\n"
        )
        (mesh,) = load_obj(str(p))
        assert mesh.normals is not None
        np.testing.assert_allclose(mesh.normals[0], [(0, 0, 1)] * 3)

    def test_group_splits_shapes(self, tmp_path):
        p = tmp_path / "g.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "g a\nf 1 2 3\n"
            "g b\nf 1 2 3\n"
        )
        meshes = load_obj(str(p))
        assert [m.name for m in meshes] == ["a", "b"]

    def test_first_face_material_wins(self, tmp_path):
        # tinyobj takes material_ids[0] for the whole shape
        # (reference src/scene/sceneloader.cpp:52).
        mtl = tmp_path / "m.mtl"
        mtl.write_text("newmtl one\nKd 1 0 0\nnewmtl two\nKd 0 1 0\n")
        p = tmp_path / "mm.obj"
        p.write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "g s\nusemtl one\nf 1 2 3\nusemtl two\nf 1 2 3\n"
        )
        (mesh,) = load_obj(str(p))
        assert mesh.num_faces == 2
        np.testing.assert_allclose(mesh.material.kd, [1, 0, 0])

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            load_obj("/nonexistent/x.obj")

    def test_empty_raises(self, tmp_path):
        p = tmp_path / "e.obj"
        p.write_text("v 0 0 0\n")
        with pytest.raises(ValueError):
            load_obj(str(p))


class TestFlatten:
    def test_loaded_matches_procedural_cornell(self, cornell_obj):
        """The OBJ round-trip and the procedural builder give the same
        triangle soup (geometry is grouped differently, so compare sets)."""
        loaded = scene_from_mesh(load_obj(cornell_obj))
        built = cornell_box()
        lv = np.asarray(loaded.triangles.v0)[np.asarray(loaded.triangles.valid)]
        bv = np.asarray(built.triangles.v0)[np.asarray(built.triangles.valid)]
        assert lv.shape == bv.shape
        a = set(map(tuple, np.round(lv, 5)))
        b = set(map(tuple, np.round(bv, 5)))
        assert a == b

    def test_padding_and_lights(self):
        scene = cornell_box()
        assert scene.num_triangles % 256 == 0
        assert int(scene.triangles.valid.sum()) == 36
        assert scene.num_lights == 1
        assert int(scene.lights.face_count[0]) == 2
        light_idx = np.asarray(scene.lights.tri_idx[0])
        assert np.asarray(scene.triangles.is_light)[light_idx].all()

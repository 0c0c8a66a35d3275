"""Parity tests: native C++ OBJ loader vs the pure-Python loader."""

import numpy as np
import pytest

from esctp1raytracer_tpu.scene.builders import write_cornell_obj
from esctp1raytracer_tpu.scene.native_loader import load_obj_native, native_available
from esctp1raytracer_tpu.scene.objloader import load_obj

from esctp1raytracer_tpu.utils.nativebuild import last_build_error

pytestmark = pytest.mark.skipif(
    not native_available(),
    reason=f"native loader build failed: {last_build_error() or 'unknown'}",
)


@pytest.fixture()
def cornell_obj(tmp_path):
    path = str(tmp_path / "cornell.obj")
    write_cornell_obj(path)
    return path


def assert_meshes_equal(a, b):
    assert len(a) == len(b)
    for ma, mb in zip(a, b):
        assert ma.name == mb.name
        np.testing.assert_allclose(ma.vertices, mb.vertices, atol=1e-6)
        assert (ma.normals is None) == (mb.normals is None)
        if ma.normals is not None:
            np.testing.assert_allclose(ma.normals, mb.normals, atol=1e-6)
        np.testing.assert_allclose(ma.material.ka, mb.material.ka)
        np.testing.assert_allclose(ma.material.kd, mb.material.kd)
        np.testing.assert_allclose(ma.material.ks, mb.material.ks)
        np.testing.assert_allclose(ma.material.ke, mb.material.ke)
        assert ma.material.ns == mb.material.ns


def test_cornell_matches_python(cornell_obj):
    assert_meshes_equal(load_obj_native(cornell_obj), load_obj(cornell_obj))


def test_mixed_format_matches_python(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text("newmtl red\nKa 0.1 0 0\nKd 0.9 0 0\nNs 32\nnewmtl glow\nKe 5 4 3\n")
    p = tmp_path / "t.obj"
    p.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\nvt 0.5 0.5\n"
        "g quad\nusemtl red\nf 1/1/1 2/1/1 4/1/1 3/1/1\n"
        "g tri\nusemtl glow\nf -4//-1 -3//-1 -2//-1\n"
        "g plain\nf 1 2 3\n"
    )
    assert_meshes_equal(load_obj_native(str(p)), load_obj(str(p)))


def test_group_quirk_matches_python(tmp_path):
    # Faces before a g-statement land in the previous shape (the tinyobj
    # behavior that makes the Cornell shortBox red).
    p = tmp_path / "g.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "g a\nf 1 2 3\nf 1 2 3\n"
        "g b\nf 1 2 3\n"
    )
    native = load_obj_native(str(p))
    py = load_obj(str(p))
    assert [m.name for m in native] == [m.name for m in py] == ["a", "b"]
    assert [m.num_faces for m in native] == [2, 1]


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_obj_native(str(tmp_path / "nope.obj"))


def test_empty_raises(tmp_path):
    p = tmp_path / "e.obj"
    p.write_text("v 0 0 0\n")
    with pytest.raises(ValueError):
        load_obj_native(str(p))


def test_large_synthetic_roundtrip(tmp_path):
    # A bigger file exercising many faces + negative indices.
    rng = np.random.RandomState(0)
    lines = []
    for i in range(3000):
        for _ in range(3):
            lines.append("v %f %f %f" % tuple(rng.randn(3)))
        lines.append("f -3 -2 -1")
    p = tmp_path / "big.obj"
    p.write_text("\n".join(lines) + "\n")
    native = load_obj_native(str(p))
    py = load_obj(str(p))
    assert_meshes_equal(native, py)
    assert sum(m.num_faces for m in native) == 3000

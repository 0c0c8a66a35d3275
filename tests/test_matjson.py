"""JSON material-override tests (the reference's dead .mat feature, alive)."""

import json

import numpy as np
import pytest

from esctp1raytracer_tpu.scene.builders import write_cornell_obj
from esctp1raytracer_tpu.scene.matjson import (
    apply_material_overrides,
    load_material_overrides,
    load_obj_with_mat,
)
from esctp1raytracer_tpu.scene.objloader import load_obj


def test_override_applies(tmp_path):
    obj = str(tmp_path / "c.obj")
    write_cornell_obj(obj)
    mat = tmp_path / "c.mat"
    mat.write_text(json.dumps({
        "floor_0": {"kd": [0.1, 0.2, 0.3], "Ns": 99.0},
        "nonexistent": {"kd": [1, 1, 1]},
    }))
    meshes = load_obj_with_mat(obj)
    floor = next(m for m in meshes if m.name == "floor_0")
    np.testing.assert_allclose(floor.material.kd, [0.1, 0.2, 0.3])
    assert floor.material.ns == 99.0
    # ka untouched
    np.testing.assert_allclose(floor.material.ka, [0.725, 0.71, 0.68])


def test_no_mat_file_is_noop(tmp_path):
    obj = str(tmp_path / "c.obj")
    write_cornell_obj(obj)
    a = load_obj(obj)
    b = load_obj_with_mat(obj)
    np.testing.assert_allclose(a[0].material.kd, b[0].material.kd)


def test_bad_json_rejected(tmp_path):
    p = tmp_path / "x.mat"
    p.write_text("[1, 2, 3]")
    with pytest.raises(ValueError):
        load_material_overrides(str(p))

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


class TestTypedSchema:
    """The reference's principled schema (src/models/cornell_box.mat,
    parsed by the commented-out model::getMaterial,
    src/scene/sceneloader.cpp:108-146): Type selects principled / alloy /
    luminous / thinGlass."""

    def test_principled_maps_to_phong(self, tmp_path):
        p = tmp_path / "m.mat"
        p.write_text(json.dumps({
            "red": {"Type": "principled", "baseColor": [1.0, 0.0, 0.0],
                    "metallic": 0.0, "diffuse": 0.8, "specular": 0.0},
        }))
        ov = load_material_overrides(str(p))["red"]
        np.testing.assert_allclose(ov["kd"], [0.8, 0.0, 0.0])
        np.testing.assert_allclose(ov["ks"], [0.0, 0.0, 0.0])
        assert ov["ns"] > 2.0

    def test_metallic_tints_specular(self, tmp_path):
        p = tmp_path / "m.mat"
        p.write_text(json.dumps({
            "gold": {"Type": "principled", "baseColor": [1.0, 0.8, 0.2],
                     "metallic": 1.0, "diffuse": 0.8, "specular": 1.0},
        }))
        ov = load_material_overrides(str(p))["gold"]
        np.testing.assert_allclose(ov["kd"], [0.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(ov["ks"], [1.0, 0.8, 0.2])

    def test_alloy_and_luminous(self, tmp_path):
        p = tmp_path / "m.mat"
        p.write_text(json.dumps({
            "blue": {"Type": "alloy", "color": [0.0, 0.0, 0.5],
                     "edgeColor": [0.0, 0.0, 0.8], "roughness": 0.1},
            "light": {"Type": "luminous", "color": [1.0, 1.0, 1.0]},
        }))
        ov = load_material_overrides(str(p))
        np.testing.assert_allclose(ov["blue"]["ks"], [0.0, 0.0, 0.65])
        assert ov["blue"]["ns"] == pytest.approx(198.0)
        np.testing.assert_allclose(ov["light"]["ke"], [1.0, 1.0, 1.0])
        assert "kd" not in ov["light"]  # MTL diffuse kept

    def test_thinglass_warns_but_maps(self, tmp_path):
        p = tmp_path / "m.mat"
        p.write_text(json.dumps({
            "glass": {"Type": "thinGlass", "eta": 1.5,
                      "attenuationColor": [0.5, 0.0, 0.0],
                      "attenuationDistance": 1.0, "thickness": 0.1},
        }))
        ov = load_material_overrides(str(p))["glass"]
        assert ov["ns"] == 500.0
        np.testing.assert_allclose(ov["ks"], [0.9, 0.9, 0.9])

    def test_unknown_type_ignored(self, tmp_path):
        p = tmp_path / "m.mat"
        p.write_text(json.dumps({"x": {"Type": "hair", "color": [1, 1, 1]}}))
        assert load_material_overrides(str(p))["x"] == {}

    def test_reference_mat_file_end_to_end(self, tmp_path):
        # The exact schema of the reference's shipped cornell_box.mat,
        # applied over the generated Cornell OBJ via the sibling-.mat
        # convention (luminous light keeps its emissive role).
        obj = str(tmp_path / "c.obj")
        write_cornell_obj(obj)
        (tmp_path / "c.mat").write_text(json.dumps({
            "light_17": {"Type": "luminous", "color": [1.0, 1.0, 1.0],
                         "power": 10.0},
        }))
        meshes = load_obj_with_mat(obj)
        light = next(m for m in meshes if m.name == "light_17")
        np.testing.assert_allclose(light.material.ke, [10.0, 10.0, 10.0])
        assert light.material.is_light

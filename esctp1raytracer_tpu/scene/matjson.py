"""JSON material overrides — the reference's abandoned `.mat` experiment,
working.

The reference ships `cornell_box.mat` (a JSON principled-material file)
next to its OBJ, with the loader commented out
(src/scene/sceneloader.cpp:108-146, model::getMaterial). Here the
capability exists: a JSON file `{material_name: {ka/kd/ks/ke: [r,g,b],
ns: float}}` overrides MTL materials after loading; unknown fields are
ignored, unknown materials warned about.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from esctp1raytracer_tpu.scene.types import Material, MeshData
from esctp1raytracer_tpu.utils.debug import get_logger

logger = get_logger(__name__)

_FIELDS = ("ka", "kd", "ks", "ke", "ns")


def load_material_overrides(path: str) -> Dict[str, dict]:
    with open(path) as fh:
        data = json.load(fh)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a JSON object of materials")
    out: Dict[str, dict] = {}
    for name, fields in data.items():
        if not isinstance(fields, dict):
            raise ValueError(f"{path}: material {name!r} must be an object")
        override = {}
        for key, value in fields.items():
            lower = key.lower()
            if lower in ("ka", "kd", "ks", "ke"):
                vec = np.asarray(value, np.float32).reshape(3)
                override[lower] = vec
            elif lower == "ns":
                override["ns"] = float(value)
        out[name] = override
    return out


def apply_material_overrides(
    meshes: Sequence[MeshData], overrides: Dict[str, dict],
    by: str = "name",
) -> List[MeshData]:
    """Return meshes with materials overridden by shape name."""
    used = set()
    result = []
    for mesh in meshes:
        override = overrides.get(mesh.name)
        if override:
            used.add(mesh.name)
            mat = mesh.material
            new = Material(
                ka=override.get("ka", mat.ka), kd=override.get("kd", mat.kd),
                ks=override.get("ks", mat.ks), ke=override.get("ke", mat.ke),
                ns=override.get("ns", mat.ns),
            )
            import dataclasses

            mesh = dataclasses.replace(mesh, material=new)
        result.append(mesh)
    for name in set(overrides) - used:
        logger.warning("material override %r matched no shape", name)
    return result


def load_obj_with_mat(obj_path: str) -> List[MeshData]:
    """Load an OBJ and apply a sibling `<model>.mat` JSON if present —
    the file-layout convention the reference set up
    (src/scene/sceneloader.cpp:21-22)."""
    from esctp1raytracer_tpu.scene.objloader import load_obj

    meshes = load_obj(obj_path)
    mat_path = os.path.splitext(obj_path)[0] + ".mat"
    if os.path.exists(mat_path):
        meshes = apply_material_overrides(meshes, load_material_overrides(mat_path))
    return meshes

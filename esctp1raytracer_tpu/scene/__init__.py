from esctp1raytracer_tpu.scene.types import (
    Scene,
    TriangleBuffer,
    SphereBuffer,
    LightTable,
    Material,
    MeshData,
)
from esctp1raytracer_tpu.scene.objloader import load_obj
from esctp1raytracer_tpu.scene.builders import (
    scene_from_mesh,
    cornell_box,
    sphere_plane_scene,
    ten_sphere_scene,
    mixed_scene,
    random_scene,
)

__all__ = [
    "Scene",
    "TriangleBuffer",
    "SphereBuffer",
    "LightTable",
    "Material",
    "MeshData",
    "load_obj",
    "scene_from_mesh",
    "cornell_box",
    "sphere_plane_scene",
    "ten_sphere_scene",
    "mixed_scene",
    "random_scene",
]

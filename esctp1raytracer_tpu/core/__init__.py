from esctp1raytracer_tpu.core.camera import Camera
from esctp1raytracer_tpu.core.render import render, RenderConfig
from esctp1raytracer_tpu.core.intersect import (
    HitRecord,
    closest_hit,
    any_hit,
    mt_intersect,
    sphere_intersect,
)

__all__ = [
    "Camera",
    "render",
    "RenderConfig",
    "HitRecord",
    "closest_hit",
    "any_hit",
    "mt_intersect",
    "sphere_intersect",
]

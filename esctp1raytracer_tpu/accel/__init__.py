from esctp1raytracer_tpu.accel.aabb import aabb_intersect, triangle_bounds
from esctp1raytracer_tpu.accel.clusters import ClusteredTriangles, build_clusters
from esctp1raytracer_tpu.accel.bvh import BVH, build_bvh

__all__ = [
    "aabb_intersect",
    "triangle_bounds",
    "ClusteredTriangles",
    "build_clusters",
    "BVH",
    "build_bvh",
]

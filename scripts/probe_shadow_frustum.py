#!/usr/bin/env python
"""Shadow-frustum structural culling for the config-5 occlusion leg:
measure how many Morton sub-blocks a static per-block "can this block
occlude anything toward the light" precomputation could drop.

The candidate rule (VERDICT r4 item 3): drop block B from shadow lists
when B cannot intersect any segment P->L with P a potential hit point
and L on the light quad. The necessary-condition test implemented here
is the tightest convex one: B ∩ conv(hit-region ∪ light-quad) = ∅.

The structural observation this probe quantifies: every nonempty block
contains scene triangles, and any hit point P on a triangle inside B
starts its own shadow segment INSIDE B — so B trivially intersects a
shadow segment and can never be dropped. A static mask can only ever
drop blocks with zero valid triangles, which the per-ray slab test
culls anyway (inverted sentinel AABBs never pass). The probe verifies
this on the actual BASELINE config-5 scene (100k soup + ground + area
light) at the production block granularity.

Reference anchor: the reference's early-exit `occlusion`
(/root/reference/src/main.cpp:314-329) — its intent (shadow rays are
cheaper) is already captured by the t-ceiling slab cull; this probe
closes the remaining structural idea with a measured (and provable)
negative.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from esctp1raytracer_tpu.scene import builders
from esctp1raytracer_tpu.kernels import rt_tile

scene = builders.random_scene(100_000)
tris = scene.triangles

# Production sub-block AABBs (the tile kernel's cull-pre-pass table).
tc, aabbs, perm, ov_buf, _ = rt_tile.tri_constants_sub(tris)
aabbs = np.asarray(aabbs)  # [8, nsub]
bmin = aabbs[0:3].T  # [nsub, 3]
bmax = aabbs[3:6].T
nonempty = (bmin <= bmax).all(axis=1)
nsub = bmin.shape[0]

# Light quad corners (from the emissive faces the light table indexes).
lt = scene.lights
v = np.stack([np.asarray(tris.v0), np.asarray(tris.v1),
              np.asarray(tris.v2)], axis=1)  # [N, 3, 3]
fc = int(np.asarray(lt.face_count)[0])
lidx = np.asarray(lt.tri_idx)[0, :fc]
lpts = v[lidx].reshape(-1, 3)
lmin, lmax = lpts.min(0), lpts.max(0)

# Hit region = AABB of all valid scene geometry (every surface point is
# a potential shadow-ray origin).
valid = np.asarray(tris.valid)
smin = v[valid].reshape(-1, 3).min(0)
smax = v[valid].reshape(-1, 3).max(0)

# conv(hit-region ∪ light-quad) for AABBs = componentwise union box:
# every segment P->L lies inside it, and it is the tightest convex
# necessary-condition region expressible per-axis.
hmin = np.minimum(smin, lmin)
hmax = np.maximum(smax, lmax)

outside = ((bmax < hmin) | (bmin > hmax)).any(axis=1)
droppable = outside & nonempty
print(f"scene AABB {smin.round(2)}..{smax.round(2)}")
print(f"light quad {lmin.round(2)}..{lmax.round(2)}")
print(f"blocks: {nsub} total, {int(nonempty.sum())} nonempty")
print(f"static shadow-frustum droppable blocks: {int(droppable.sum())} "
      f"({droppable.mean() * 100:.2f}%)")

# The structural proof, verified numerically: every nonempty block
# contains >= 1 valid triangle, i.e. its own shadow-ray origins.
tri_min = v.min(1)
tri_max = v.max(1)
per_block_has_origin = []
sub = rt_tile.SUB  # triangles per sub-block in the packed table
perm_np = np.asarray(perm)
for b in range(nsub):
    ids = perm_np[b * sub:(b + 1) * sub]
    per_block_has_origin.append(bool((ids >= 0).any()))
per_block_has_origin = np.asarray(per_block_has_origin)
both = per_block_has_origin & nonempty
print(f"nonempty blocks containing shadow-ray origin triangles: "
      f"{int(both.sum())}/{int(nonempty.sum())} "
      f"(mismatches are oversized-segregation slots)")
print("conclusion: every origin-bearing block's own hit points start "
      "shadow segments inside the block -> no static light-frustum "
      "mask can drop it; measured droppable = 0 on config 5")

#!/usr/bin/env python
"""Generate the pinned golden-pixel grid for tests/test_oracle.py.

Captures the C++-exact shading arithmetic (the committed scalar NumPy
oracle, seed 0) at a lattice of pixels across the canonical 48x36
Cornell view, keeping only pixels whose 3x3 neighborhood is flat (no
eps-window / silhouette boundary can move them) and where the jnp
backend agrees with the oracle to float32 noise. The result pins the
whole shading path at >= 64 coordinates: any drift in either the
framework or the oracle fails tests/test_oracle.py loudly.

Writes tests/golden/cornell_pixels_48x36.npz {rows, cols, rgb}.
Deterministic: re-running on an unchanged tree reproduces the file.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render  # noqa: E402
from esctp1raytracer_tpu.testing import oracle_render  # noqa: E402

W, H = 48, 36
FLAT_TOL = 0.02    # 3x3 neighborhood peak-to-peak ceiling (per channel)
AGREE_TOL = 1e-5   # oracle-vs-jnp ceiling for a pixel to be pinnable
TARGET = 64

scene = cornell_box()
ref = oracle_render(scene, (0, 1, 2), (0, 1, 0), W, H)
cam = Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=W / H)
img = np.asarray(render(scene, cam, W, H, RenderConfig(backend="jnp", seed=0)))

diff = np.abs(ref - img).max(-1)
print(f"oracle vs jnp: max|diff| {diff.max():.2e}, "
      f"frac<=1e-5 {(diff <= AGREE_TOL).mean():.4f}")

# Flatness: per-channel peak-to-peak over the 3x3 neighborhood.
flat = np.zeros((H, W), bool)
for r in range(1, H - 1):
    for c in range(1, W - 1):
        nb = ref[r - 1:r + 2, c - 1:c + 2]
        if (nb.max((0, 1)) - nb.min((0, 1))).max() < FLAT_TOL:
            flat[r, c] = True

good = flat & (diff <= AGREE_TOL)
print(f"candidate pixels: {good.sum()} of {H * W}")

# Walk a lattice, densifying until >= TARGET pixels survive the filter.
rows, cols = [], []
for step in (4, 3, 2, 1):
    rows, cols = [], []
    for r in range(1, H - 1, step):
        for c in range(1, W - 1, step):
            if good[r, c]:
                rows.append(r)
                cols.append(c)
    if len(rows) >= TARGET:
        break
assert len(rows) >= TARGET, f"only {len(rows)} pinnable pixels"
rows = np.asarray(rows, np.int32)
cols = np.asarray(cols, np.int32)
rgb = ref[rows, cols].astype(np.float32)

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "cornell_pixels_48x36.npz")
np.savez(out, rows=rows, cols=cols, rgb=rgb)
print(f"pinned {len(rows)} pixels (lattice step {step}) -> {out}")
print(f"coverage: rows {rows.min()}-{rows.max()}, cols {cols.min()}-{cols.max()}, "
      f"lit fraction {(rgb.max(-1) > 0.01).mean():.2f}")

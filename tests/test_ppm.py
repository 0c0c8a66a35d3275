"""PPM writer parity tests against the reference's exact output format
(src/main.cpp:658-689: P3 header, rows h = H-1..0, clamp-then-truncate)."""

import numpy as np

from esctp1raytracer_tpu.io.ppm import read_ppm, write_ppm


def test_header_and_row_order(tmp_path):
    img = np.zeros((2, 3, 3), np.float32)
    img[0, 0] = (1.0, 0.0, 0.0)  # framebuffer row 0 (bottom), col 0
    img[1, 2] = (0.0, 1.0, 0.0)  # framebuffer row 1 (top), col 2
    p = str(tmp_path / "x.ppm")
    write_ppm(p, img)
    lines = open(p).read().splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "3 2"
    assert lines[2] == "255"
    # First emitted row is framebuffer row H-1 (top), like the reference.
    assert lines[3:6] == ["0 0 0", "0 0 0", "0 255 0"]
    assert lines[6:9] == ["255 0 0", "0 0 0", "0 0 0"]


def test_clamp_and_truncate(tmp_path):
    img = np.asarray([[[2.0, 0.999, 0.5004]]], np.float32)
    p = str(tmp_path / "c.ppm")
    write_ppm(p, img)
    body = open(p).read().splitlines()[3]
    r, g, b = map(int, body.split())
    assert r == 255  # clamped to 1.0 then * 255
    assert g == int(0.999 * 255)  # truncation, not rounding -> 254
    assert b == int(np.float32(0.5004) * 255)


def test_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(5, 7, 3).astype(np.float32)
    p = str(tmp_path / "r.ppm")
    write_ppm(p, img)
    back = read_ppm(p)
    assert back.shape == img.shape
    np.testing.assert_allclose(back, np.floor(img * 255) / 255, atol=1 / 255 + 1e-6)


def test_native_writer_byte_identical(tmp_path):
    """native/ppm.cpp must emit byte-for-byte what the Python writer does
    (including the row flip, truncation, and trailing newline)."""
    from esctp1raytracer_tpu.io.native_ppm import write_ppm_native
    from esctp1raytracer_tpu.io.ppm import write_ppm_python

    rng = np.random.RandomState(42)
    for shape in [(1, 1, 3), (2, 3, 3), (17, 31, 3), (64, 48, 3)]:
        img = (rng.rand(*shape) * 1.2).astype(np.float32)  # some >1: clamp
        pn = str(tmp_path / "n.ppm")
        pp = str(tmp_path / "p.ppm")
        if not write_ppm_native(pn, img):
            import pytest

            pytest.skip("native ppm writer unavailable (no g++)")
        write_ppm_python(pp, img)
        assert open(pn, "rb").read() == open(pp, "rb").read(), shape


def test_default_writer_roundtrips_via_native(tmp_path):
    """write_ppm (native-first) output must read back like the Python
    writer's."""
    rng = np.random.RandomState(7)
    img = rng.rand(9, 11, 3).astype(np.float32)
    p = str(tmp_path / "d.ppm")
    write_ppm(p, img)
    back = read_ppm(p)
    np.testing.assert_allclose(back, np.floor(img * 255) / 255,
                               atol=1 / 255 + 1e-6)

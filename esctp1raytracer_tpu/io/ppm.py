"""P3 (ASCII) PPM writer/reader, byte-compatible with the reference.

Reference writer (src/main.cpp:658-689): header "P3\\nW H\\n255", rows
emitted h = H-1 .. 0, each channel clamped to 1.0 then scaled by 255 and
*truncated* to int, one "r g b\\n" triplet per line. The reader exists for
golden-image comparison tests (the reference compared PPMs by eye;
scripts/run.sh:27-41).
"""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, image: np.ndarray) -> None:
    """Write image [H, W, 3] float (row h = framebuffer row h) as P3 PPM.

    Uses the native C++ writer (native/ppm.cpp — the reference writer's
    IO-runtime role) when it builds, byte-identical to the Python path
    below; falls back to pure Python otherwise."""
    from esctp1raytracer_tpu.io.native_ppm import write_ppm_native

    if write_ppm_native(path, image):
        return
    write_ppm_python(path, image)


def write_ppm_python(path: str, image: np.ndarray) -> None:
    """The pure-Python reference implementation (parity oracle for the
    native writer; always available)."""
    image = np.asarray(image)
    h, w, _ = image.shape
    # Clamp only the top end, like the reference (no negative colors occur).
    clamped = np.minimum(image.astype(np.float32), 1.0)
    values = (clamped * 255.0).astype(np.int32)  # C-style truncation
    flipped = values[::-1]  # rows h = H-1 .. 0
    with open(path, "w") as fh:
        fh.write(f"P3\n{w} {h}\n255\n")
        flat = flipped.reshape(-1, 3)
        fh.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
        fh.write("\n")


def read_ppm(path: str) -> np.ndarray:
    """Read a P3 PPM back into float [H, W, 3] in framebuffer row order
    (row 0 = bottom row, inverting the writer's flip), values in [0, 1]."""
    with open(path, "r") as fh:
        tokens = []
        for line in fh:
            line = line.split("#", 1)[0]
            tokens.extend(line.split())
    if tokens[0] != "P3":
        raise ValueError(f"not a P3 PPM: {path}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.asarray(tokens[4 : 4 + w * h * 3], np.float32).reshape(h, w, 3)
    return data[::-1] / float(maxval)

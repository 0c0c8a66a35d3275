"""ctypes binding for the native PPM writer (native/ppm.cpp).

The reference's image IO is native C++ (src/main.cpp:658-689); this
keeps that capability for production frame sizes — the pure-Python
writer string-formats W*H lines (~10 s host time at 4K), the native one
streams hand-formatted bytes. Built on demand with g++ and cached next
to the source, same pattern as scene/native_loader.py; byte-identical
output is pinned by tests/test_ppm.py.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

from esctp1raytracer_tpu.utils.debug import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "ppm.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libescppm.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    from esctp1raytracer_tpu.utils.nativebuild import build_shared, last_build_error

    if build_shared(_SRC, _LIB):
        return True
    logger.warning("native ppm build failed (%s); using Python writer",
                   last_build_error())
    return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (not os.path.exists(_LIB)) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as exc:
            logger.warning("native ppm load failed (%s)", exc)
            _build_failed = True
            return None
        lib.esc_write_ppm_p3.restype = ctypes.c_int
        lib.esc_write_ppm_p3.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def write_ppm_native(path: str, image: np.ndarray) -> bool:
    """Write [H, W, 3] float via the native writer. False = unavailable
    (caller falls back to the Python writer); raises on an IO error."""
    lib = _get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(np.asarray(image), dtype=np.float32)
    h, w, c = img.shape
    assert c == 3
    rc = lib.esc_write_ppm_p3(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(w), int(h),
    )
    if rc != 0:
        raise OSError(f"native ppm writer failed with code {rc} for {path}")
    return True

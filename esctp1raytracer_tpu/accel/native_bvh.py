"""ctypes binding for the native BVH builder (native/bvh.cpp)."""

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
_SRC = os.path.join(_NATIVE_DIR, "bvh.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libescbvh.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            return None
        stale = (not os.path.exists(_LIB)) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if stale:
            from esctp1raytracer_tpu.utils.nativebuild import (
                build_shared, last_build_error,
            )

            if not build_shared(_SRC, _LIB):
                logger.warning("native BVH build failed (%s)",
                               last_build_error())
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as exc:
            logger.warning("cannot load %s: %s", _LIB, exc)
            _failed = True
            return None
        fptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        iptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.esc_bvh_build.restype = ctypes.c_void_p
        lib.esc_bvh_build.argtypes = [fptr, ctypes.c_int32, ctypes.c_int32]
        lib.esc_bvh_num_nodes.restype = ctypes.c_int32
        lib.esc_bvh_num_nodes.argtypes = [ctypes.c_void_p]
        lib.esc_bvh_fetch.restype = None
        lib.esc_bvh_fetch.argtypes = [ctypes.c_void_p, fptr, fptr, iptr, iptr,
                                      iptr, iptr, iptr]
        lib.esc_bvh_free.restype = None
        lib.esc_bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_bvh_available() -> bool:
    return _get_lib() is not None


def build_bvh_native(verts: np.ndarray, orig_idx: np.ndarray, leaf_size: int):
    from esctp1raytracer_tpu.accel.bvh import BVH

    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native BVH unavailable")
    n = verts.shape[0]
    flat = np.ascontiguousarray(verts.reshape(n * 9), np.float32)
    handle = lib.esc_bvh_build(flat, n, leaf_size)
    try:
        m = lib.esc_bvh_num_nodes(handle)
        bmin = np.empty(m * 3, np.float32)
        bmax = np.empty(m * 3, np.float32)
        left = np.empty(m, np.int32)
        right = np.empty(m, np.int32)
        start = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        order = np.empty(n, np.int32)
        lib.esc_bvh_fetch(handle, bmin, bmax, left, right, start, count, order)
    finally:
        lib.esc_bvh_free(handle)
    return BVH(
        bmin=bmin.reshape(m, 3), bmax=bmax.reshape(m, 3),
        left=left, right=right, start=start, count=count,
        order=orig_idx[order], verts=verts[order],
    )

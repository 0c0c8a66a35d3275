"""ctypes binding for the native C++ OBJ loader (native/objloader.cpp).

The reference's asset pipeline is native C++ (tinyobjloader,
src/scene/tiny_obj_loader.h, wrapped by src/scene/sceneloader.cpp); this
module keeps that capability: a compiled loader for production-scale
assets, built on demand with g++ and cached next to the source. The pure
Python loader (scene/objloader.py) is the always-available fallback with
identical semantics (pinned by tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional

import numpy as np

from esctp1raytracer_tpu.scene.types import Material, MeshData
from esctp1raytracer_tpu.utils.debug import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "objloader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libescloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    from esctp1raytracer_tpu.utils.nativebuild import build_shared, last_build_error

    if build_shared(_SRC, _LIB):
        return True
    logger.warning("native loader build failed (%s); using Python loader",
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
            logger.warning("cannot load %s: %s", _LIB, exc)
            _build_failed = True
            return None
        lib.esc_load_obj.restype = ctypes.c_void_p
        lib.esc_load_obj.argtypes = [ctypes.c_char_p]
        lib.esc_error.restype = ctypes.c_char_p
        lib.esc_error.argtypes = [ctypes.c_void_p]
        lib.esc_num_shapes.restype = ctypes.c_int32
        lib.esc_num_shapes.argtypes = [ctypes.c_void_p]
        lib.esc_shape_faces.restype = ctypes.c_int32
        lib.esc_shape_faces.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.esc_shape_name.restype = ctypes.c_char_p
        lib.esc_shape_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.esc_shape_has_normals.restype = ctypes.c_int32
        lib.esc_shape_has_normals.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.esc_shape_has_uvs.restype = ctypes.c_int32
        lib.esc_shape_has_uvs.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        fptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        for name in ("esc_shape_vertices", "esc_shape_normals", "esc_shape_uvs"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, fptr]
        lib.esc_shape_material.restype = ctypes.c_int32
        lib.esc_shape_material.argtypes = [ctypes.c_void_p, ctypes.c_int32, fptr]
        lib.esc_free.restype = None
        lib.esc_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_obj_native(path: str) -> List[MeshData]:
    """Load an OBJ with the C++ parser; raises like the Python loader."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++ or build failed)")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    handle = lib.esc_load_obj(path.encode())
    try:
        err = lib.esc_error(handle)
        if err:
            message = err.decode()
            if "No triangles" in message:
                raise ValueError(message)
            raise ValueError(message)
        meshes: List[MeshData] = []
        for s in range(lib.esc_num_shapes(handle)):
            faces = lib.esc_shape_faces(handle, s)
            verts = np.empty(faces * 9, np.float32)
            lib.esc_shape_vertices(handle, s, verts)
            normals = None
            if lib.esc_shape_has_normals(handle, s):
                normals = np.empty(faces * 9, np.float32)
                lib.esc_shape_normals(handle, s, normals)
                normals = normals.reshape(faces, 3, 3)
            uv = None
            if lib.esc_shape_has_uvs(handle, s):
                uv = np.empty(faces * 6, np.float32)
                lib.esc_shape_uvs(handle, s, uv)
                uv = uv.reshape(faces, 3, 2)
            mat_buf = np.empty(13, np.float32)
            found = lib.esc_shape_material(handle, s, mat_buf)
            if not found:
                logger.warning(
                    "material for shape %r not found; using default",
                    lib.esc_shape_name(handle, s).decode(),
                )
            material = Material(
                ka=mat_buf[0:3].copy(), kd=mat_buf[3:6].copy(),
                ks=mat_buf[6:9].copy(), ke=mat_buf[9:12].copy(),
                ns=float(mat_buf[12]),
            )
            meshes.append(
                MeshData(
                    name=lib.esc_shape_name(handle, s).decode(),
                    vertices=verts.reshape(faces, 3, 3),
                    normals=normals,
                    uv=uv,
                    material=material,
                )
            )
        return meshes
    finally:
        lib.esc_free(handle)

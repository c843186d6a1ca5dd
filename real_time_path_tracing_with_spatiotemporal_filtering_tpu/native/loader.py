"""ctypes binding for the native OBJ loader (objloader.cpp).

Falls back gracefully: :func:`available` is False until the shared library
has been built (make -C .../native), and scene/obj.py always keeps the pure
Python path as the oracle.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libptsf.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ptsf_load_obj.restype = ctypes.c_void_p
        lib.ptsf_load_obj.argtypes = [ctypes.c_char_p]
        lib.ptsf_mesh_counts.restype = None
        lib.ptsf_mesh_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ptsf_mesh_copy.restype = None
        lib.ptsf_mesh_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ptsf_mesh_free.restype = None
        lib.ptsf_mesh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    if not os.path.exists(path):
        raise FileNotFoundError(f"OBJ file not found: {path!r}")
    handle = lib.ptsf_load_obj(path.encode())
    if not handle:
        raise ValueError(f"native loader failed to parse {path!r}")
    try:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        lib.ptsf_mesh_counts(handle, ctypes.byref(nv), ctypes.byref(nt))
        verts = np.empty((nv.value, 3), np.float32)
        idx = np.empty((nt.value, 3), np.int32)
        lib.ptsf_mesh_copy(
            handle,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return verts, idx
    finally:
        lib.ptsf_mesh_free(handle)

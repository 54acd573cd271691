"""Native (C++) runtime components, loaded via ctypes.

Currently: a BVH ray caster (``raytrace.cpp``) replacing the reference's
open3d/embree ``RaycastingScene`` (SURVEY.md §2.5). The library is built once
on demand with g++ (`ensure_built`); every consumer must degrade gracefully to
the numpy/jnp path if no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libggtpu.so")
_lock = threading.Lock()
_lib = None
_tried = False


def ensure_built() -> Optional[str]:
    """Compile the native library if missing. Returns the .so path or None."""
    if os.path.exists(_SO):
        src = os.path.join(_DIR, "raytrace.cpp")
        if os.path.getmtime(_SO) >= os.path.getmtime(src):
            return _SO
    try:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
            os.path.join(_DIR, "raytrace.cpp"), "-o", _SO,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = ensure_built()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        lib.bvh_raycast.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


class BVH:
    """Reusable BVH handle for repeated casts against the same mesh."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native raytrace library unavailable")
        self._lib = lib
        v = np.ascontiguousarray(vertices, np.float32)
        f = np.ascontiguousarray(faces, np.int32)
        self._keepalive = (v, f)
        self._h = lib.bvh_build(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), np.int32(len(v)),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), np.int32(len(f)),
        )

    def raycast(self, origins: np.ndarray, dirs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        n = len(o)
        t = np.empty((n,), np.float32)
        pid = np.empty((n,), np.int32)
        self._lib.bvh_raycast(
            self._h,
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(n),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return t.astype(np.float64), pid.astype(np.int64)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bvh_free(self._h)
                self._h = None
        except Exception:
            pass


def bvh_raycast_or_none(origins, dirs, vertices, faces):
    """One-shot raycast via the native BVH, or None if unavailable."""
    try:
        bvh = BVH(vertices, faces)
    except Exception:
        return None
    return bvh.raycast(origins, dirs)

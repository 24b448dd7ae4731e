"""ctypes bindings for the native host library (native/gs2d_native.cpp).

Auto-builds with make on first use if a toolchain is present; every entry
point has a numpy/jnp fallback so the framework runs without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgs2d_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.knn3_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.parse_points3d_bin.restype = ctypes.c_int64
        lib.parse_points3d_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def knn3_mean_sq_dist(points: np.ndarray) -> Optional[np.ndarray]:
    """Native 3-NN mean squared distance, or None if the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    lib.knn3_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def parse_points3d_bin(path: str):
    """Fast COLMAP points3D.bin parse, or None if the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    n = lib.parse_points3d_bin(path.encode(), None, None, None, 0)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.parse_points3d_bin(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if got != n:
        return None
    return xyz, rgb, err

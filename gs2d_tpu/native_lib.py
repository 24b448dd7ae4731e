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
    # ALWAYS invoke make: its dependency rule is a no-op when the .so is
    # fresh, and skipping it silently loads a stale binary after
    # gs2d_native.cpp edits
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       capture_output=True, timeout=120, check=True)
    except Exception:
        if not os.path.exists(_LIB_PATH):
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
        lib.parse_images_bin_poses.restype = ctypes.c_int64
        lib.parse_images_bin_poses.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
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


def parse_images_bin_poses(path: str):
    """Fast COLMAP images.bin pose parse (no 2-D points), or None.

    Returns (img_ids (N,), qvec (N,4), tvec (N,3), cam_ids (N,),
    names list[str]). Falls back (returns None) when the packed name
    buffer would truncate — detected by a terminator-count mismatch."""
    lib = _load()
    if lib is None:
        return None
    n = lib.parse_images_bin_poses(path.encode(), None, None, None, None,
                                   None, 0, 0)
    if n < 0:
        return None
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty((n,), np.int32)
    img_ids = np.empty((n,), np.int32)
    names_cap = max(int(n) * 512, 4096)
    names = ctypes.create_string_buffer(names_cap)
    got = lib.parse_images_bin_poses(
        path.encode(),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        img_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names, names_cap, n)
    if got != n:
        return None
    name_list = names.raw.split(b"\x00")[:n]
    if len(name_list) < n:
        return None          # buffer saturated → names unreliable
    return (img_ids, qvec, tvec, cam_ids,
            [b.decode("utf-8", "replace") for b in name_list])

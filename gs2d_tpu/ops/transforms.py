"""Camera / projective geometry in the reference's conventions.

Contracts mirrored (see /root/reference/utils/graphics_utils.py:31-77 and
/root/reference/scene/cameras.py:57-60):

- ``world_to_view`` and ``projection_matrix`` return the CLASSIC
  column-vector matrices (as the reference's getWorld2View2 /
  getProjectionMatrix do); scene/cameras.py transposes them into the
  row-vector ``p_h @ M`` forms the pipeline consumes — do NOT pass these
  untransposed into preprocess().
- Projection: OpenGL-style frustum with z_sign=+1 and the reference's
  depth remap rows, so clip-space w equals camera-space z.
- ndc→pixel: x_pix = x_ndc * W/2 + (W-1)/2 (half-pixel-centered).

All functions are pure jnp and differentiable.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> np.ndarray:
    """4x4 world→view (classic column-vector form), with an optional rigid
    recentering applied to the camera center (reference getWorld2View2)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """4x4 perspective projection (column-vector form, reference
    getProjectionMatrix): clip w = +z_view, depth row maps z to
    [0, zfar] range via zfar/(zfar-znear)·z − zfar·znear/(zfar-znear)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pix_matrix(width: int, height: int) -> np.ndarray:
    """4x4 (row-vector form) mapping NDC homogeneous coords to pixel coords.

    Matches the matrix built inline at
    /root/reference/gaussian_renderer/__init__.py:69-73 (transposed
    there): x_pix = x_ndc·W/2 + w·(W−1)/2, w passthrough. The z row here
    is identity (NOT the reference's (far−near, near) remap) — harmless
    because both implementations drop it (preprocess.py keeps columns
    [0, 1, 3] only); consume z from the homography's c2 column instead.
    """
    W, H = float(width), float(height)
    M = np.array(
        [
            [W / 2, 0, 0, (W - 1) / 2],
            [0, H / 2, 0, (H - 1) / 2],
            [0, 0, 1.0, 0.0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return M.T  # row-vector form



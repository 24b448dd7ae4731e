"""Quaternion utilities (wxyz convention, matching the reference's
``build_rotation`` at /root/reference/utils/general_utils.py:78-110)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions [..., 4] (wxyz)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) → rotation matrix [..., 3, 3].

    Columns of R are the rotated basis vectors; R @ v rotates v.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """R @ diag(s): [..., 3] scales, [..., 4] quats → [..., 3, 3].

    Contract of /root/reference/utils/general_utils.py:101-110 (quats are
    normalized internally there; callers here pass activated quats).
    """
    R = quat_to_rotmat(normalize_quat(quats))
    return R * scales[..., None, :]

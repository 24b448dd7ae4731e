"""Depth-map unprojection and pseudo-normals (pure jnp).

Contract of /root/reference/utils/point_utils.py:9-37: unproject each pixel
of a depth map to a world-space point via the camera's inverse intrinsics
(note the reference's W/2 — not (W−1)/2 — pixel offset here), then take
central-difference cross products as surface normals (zero border).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _intrinsics_rowvec(camera):
    """3×3 pixel→ray matrix pieces, matching point_utils.py:10-17."""
    W, H = camera.width, camera.height
    ndc2pix = jnp.array(
        [
            [W / 2.0, 0.0, 0.0],
            [0.0, H / 2.0, 0.0],
            [0.0, 0.0, 0.0],
            [W / 2.0, H / 2.0, 1.0],
        ],
        jnp.float32)                                  # (4,3) row-vector form
    c2w = jnp.linalg.inv(camera.world_view.T)          # classic cam→world
    projection = c2w.T @ camera.full_proj              # (4,4) row-vector
    intrins = (projection @ ndc2pix)[:3, :3].T
    return intrins, c2w


def depths_to_points(camera, depthmap: jnp.ndarray) -> jnp.ndarray:
    """depthmap (H, W) → world points (H, W, 3)."""
    H, W = depthmap.shape[-2:]
    intrins, c2w = _intrinsics_rowvec(camera)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    pts = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)       # (H, W, 3)
    rays_d = pts @ jnp.linalg.inv(intrins).T @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    return depthmap.reshape(H, W, 1) * rays_d + rays_o


def depth_to_normal(camera, depth: jnp.ndarray) -> jnp.ndarray:
    """depth (1, H, W) or (H, W) → normals (H, W, 3), zero border."""
    d = depth.reshape(depth.shape[-2], depth.shape[-1])
    points = depths_to_points(camera, d)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # rsqrt(·+eps) keeps the gradient finite where the cross product
    # vanishes (empty / planar-degenerate pixels)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-20)
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)

"""On-device TSDF fusion (replaces Open3D ScalableTSDFVolume in the
reference's bounded meshing path, utils/mesh_utils.py:154-195).

A dense voxel grid is integrated against each view's depth/color maps with
projective signed distance, truncation, and running-average weights — a
`lax.scan` over views whose body is pure gather/elementwise math (TPU
friendly: the voxel block is a big flat array, the image sample is a
bilinear gather). Supports the reference's half-pixel-corrected projection.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray     # (X, Y, Z) f32 in [-1, 1]
    weight: jnp.ndarray   # (X, Y, Z) f32
    color: jnp.ndarray    # (X, Y, Z, 3) f32
    origin: jnp.ndarray   # (3,) world position of voxel (0,0,0)
    voxel_size: float


def make_volume(center: np.ndarray, radius: float, voxel_size: float,
                max_dim: int = 512) -> TSDFVolume:
    dim = int(min(max_dim, np.ceil(2 * radius / voxel_size)))
    origin = np.asarray(center, np.float32) - radius
    shape = (dim, dim, dim)
    return TSDFVolume(
        tsdf=jnp.ones(shape, jnp.float32),
        weight=jnp.zeros(shape, jnp.float32),
        color=jnp.zeros(shape + (3,), jnp.float32),
        origin=jnp.asarray(origin),
        voxel_size=float(voxel_size),
    )


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """img (H, W) or (H, W, C); x, y continuous pixel coords (N,)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    if img.ndim == 2:
        img = img[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    fx = fx[..., None]
    fy = fy[..., None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out


@functools.partial(jax.jit, static_argnames=("width", "height"))
def integrate(vol: TSDFVolume, depth: jnp.ndarray, color: jnp.ndarray,
              world_view: jnp.ndarray, fx: float, fy: float,
              width: int, height: int, sdf_trunc: float,
              depth_trunc: float) -> TSDFVolume:
    """Integrate one view. depth (H, W); color (3, H, W); world_view is the
    row-vector world→view transform; (fx, fy) focal lengths in pixels."""
    X, Y, Z = vol.tsdf.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    pts = (jnp.stack([ii, jj, kk], -1).reshape(-1, 3).astype(jnp.float32)
           * vol.voxel_size + vol.origin)
    p_view = pts @ world_view[:3, :3] + world_view[3, :3]
    z = p_view[:, 2]
    # pinhole projection with half-pixel center (ndc2pix (W-1)/2 offset)
    u = p_view[:, 0] / jnp.maximum(z, 1e-9) * fx + (width - 1) / 2.0
    v = p_view[:, 1] / jnp.maximum(z, 1e-9) * fy + (height - 1) / 2.0
    inb = ((z > 1e-4) & (u >= 0) & (u <= width - 1)
           & (v >= 0) & (v <= height - 1))

    d_samp = _bilinear(depth, u, v)[:, 0]
    c_samp = _bilinear(color.transpose(1, 2, 0), u, v)
    valid_d = (d_samp > 1e-6) & (d_samp < depth_trunc)
    sdf = d_samp - z
    upd = inb & valid_d & (sdf > -sdf_trunc)
    d = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)

    w_old = vol.weight.reshape(-1)
    t_old = vol.tsdf.reshape(-1)
    c_old = vol.color.reshape(-1, 3)
    w_new = w_old + upd.astype(jnp.float32)
    denom = jnp.maximum(w_new, 1.0)
    t_new = jnp.where(upd, (t_old * w_old + d) / denom, t_old)
    c_new = jnp.where(upd[:, None],
                      (c_old * w_old[:, None] + c_samp) / denom[:, None],
                      c_old)
    return TSDFVolume(tsdf=t_new.reshape(vol.tsdf.shape),
                      weight=w_new.reshape(vol.weight.shape),
                      color=c_new.reshape(vol.color.shape),
                      origin=vol.origin, voxel_size=vol.voxel_size)

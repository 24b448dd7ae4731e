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
    dim = int(np.ceil(2 * radius / voxel_size))
    if dim > max_dim:
        # capping must COARSEN the voxels, never shrink the covered extent
        # (a fixed-voxel cap would leave the grid in one corner of the
        # scene and nothing would ever integrate)
        dim = max_dim
        voxel_size = 2 * radius / max_dim
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
    row-vector world→view transform; (fx, fy) focal lengths in pixels.

    Processed in X-slabs under a lax.scan: materializing the full point
    grid plus temporaries at 512³ is tens of GB (OOMs a 16 GB chip); a
    slab keeps the working set to a few hundred MB while the volume
    itself stays resident.
    """
    X, Y, Z = vol.tsdf.shape
    BX = max(1, min(X, (1 << 22) // max(Y * Z, 1)))  # ~4M voxels per slab
    while X % BX:
        BX -= 1
    nb = X // BX
    # Pack depth+color into one (H·W, 4) row table: bilinear taps become
    # packed ROW gathers (fast TPU path) instead of four 1-D gathers per
    # channel (~70x slower, measured).
    table = jnp.concatenate(
        [depth[..., None], color.transpose(1, 2, 0)], -1).reshape(-1, 4)

    jj, kk = jnp.meshgrid(jnp.arange(Y), jnp.arange(Z), indexing="ij")
    jk = jnp.stack([jj, kk], -1).reshape(-1, 2).astype(jnp.float32)

    def slab(carry, b):
        tsdf, weight, colv = carry
        x0 = b * BX
        ii = (x0 + jnp.arange(BX, dtype=jnp.float32))[:, None, None]
        pts = jnp.concatenate(
            [jnp.broadcast_to(ii, (BX, Y * Z, 1)),
             jnp.broadcast_to(jk[None], (BX, Y * Z, 2))], -1
        ).reshape(-1, 3) * vol.voxel_size + vol.origin
        p_view = pts @ world_view[:3, :3] + world_view[3, :3]
        z = p_view[:, 2]
        # pinhole projection with half-pixel center (ndc2pix (W-1)/2)
        u = p_view[:, 0] / jnp.maximum(z, 1e-9) * fx + (width - 1) / 2.0
        v = p_view[:, 1] / jnp.maximum(z, 1e-9) * fy + (height - 1) / 2.0
        inb = ((z > 1e-4) & (u >= 0) & (u <= width - 1)
               & (v >= 0) & (v <= height - 1))

        x0i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, width - 2)
        y0i = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, height - 2)
        fxw = jnp.clip(u - x0i, 0.0, 1.0)[:, None]
        fyw = jnp.clip(v - y0i, 0.0, 1.0)[:, None]
        base = y0i * width + x0i
        s00 = table[base]
        s01 = table[base + 1]
        s10 = table[base + width]
        s11 = table[base + width + 1]
        samp = (s00 * (1 - fxw) * (1 - fyw) + s01 * fxw * (1 - fyw)
                + s10 * (1 - fxw) * fyw + s11 * fxw * fyw)
        d_samp = samp[:, 0]
        c_samp = samp[:, 1:4]
        valid_d = (d_samp > 1e-6) & (d_samp < depth_trunc)
        sdf = d_samp - z
        upd = inb & valid_d & (sdf > -sdf_trunc)
        d = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)

        w_old = jax.lax.dynamic_slice_in_dim(weight, x0, BX, 0).reshape(-1)
        t_old = jax.lax.dynamic_slice_in_dim(tsdf, x0, BX, 0).reshape(-1)
        c_old = jax.lax.dynamic_slice_in_dim(colv, x0, BX, 0).reshape(-1, 3)
        w_new = w_old + upd.astype(jnp.float32)
        denom = jnp.maximum(w_new, 1.0)
        t_new = jnp.where(upd, (t_old * w_old + d) / denom, t_old)
        c_new = jnp.where(upd[:, None],
                          (c_old * w_old[:, None] + c_samp) / denom[:, None],
                          c_old)
        tsdf = jax.lax.dynamic_update_slice_in_dim(
            tsdf, t_new.reshape(BX, Y, Z), x0, 0)
        weight = jax.lax.dynamic_update_slice_in_dim(
            weight, w_new.reshape(BX, Y, Z), x0, 0)
        colv = jax.lax.dynamic_update_slice_in_dim(
            colv, c_new.reshape(BX, Y, Z, 3), x0, 0)
        return (tsdf, weight, colv), None

    (tsdf, weight, colv), _ = jax.lax.scan(
        slab, (vol.tsdf, vol.weight, vol.color),
        jnp.arange(nb, dtype=jnp.int32))
    return TSDFVolume(tsdf=tsdf, weight=weight, color=colv,
                      origin=vol.origin, voxel_size=vol.voxel_size)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def fuse_sdf_points(pts: jnp.ndarray, trunc: jnp.ndarray,
                    sdf_acc: jnp.ndarray, w_acc: jnp.ndarray,
                    col_acc: jnp.ndarray,
                    depth: jnp.ndarray, color: jnp.ndarray,
                    alpha: jnp.ndarray, world_view: jnp.ndarray,
                    fx: float, fy: float, width: int, height: int):
    """One view of free-point projective SDF fusion (the unbounded /
    contracted meshing path, reference utils/mesh_utils.py:211-257).

    pts (N,3) world points, trunc (N,) per-point truncation band; running
    (sdf, w, col) accumulators are updated with weight-1 running means.
    Nearest-neighbor image sampling via one packed row-gather per slab.
    """
    N = pts.shape[0]
    B = min(N, 1 << 22)
    while N % B:
        B -= 1
    nb = N // B
    table = jnp.concatenate(
        [depth[..., None], alpha[..., None],
         color.transpose(1, 2, 0)], -1).reshape(-1, 5)

    def slab(carry, b):
        sdf_a, w_a, col_a = carry
        x0 = b * B
        p = jax.lax.dynamic_slice_in_dim(pts, x0, B, 0)
        tr = jax.lax.dynamic_slice_in_dim(trunc, x0, B, 0)
        pv = p @ world_view[:3, :3] + world_view[3, :3]
        z = pv[:, 2]
        u = pv[:, 0] / jnp.maximum(z, 1e-9) * fx + (width - 1) / 2.0
        v = pv[:, 1] / jnp.maximum(z, 1e-9) * fy + (height - 1) / 2.0
        inb = ((z > 1e-4) & (u >= 0) & (u <= width - 1)
               & (v >= 0) & (v <= height - 1))
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, height - 1)
        s = table[vi * width + ui]                     # (B, 5)
        d_s, a_s, c_s = s[:, 0], s[:, 1], s[:, 2:5]
        sdf = d_s - z
        ok = inb & (a_s > 0.5) & (d_s > 1e-6) & (sdf > -tr)
        d = jnp.clip(sdf / tr, -1.0, 1.0)
        w_old = jax.lax.dynamic_slice_in_dim(w_a, x0, B, 0)
        s_old = jax.lax.dynamic_slice_in_dim(sdf_a, x0, B, 0)
        c_old = jax.lax.dynamic_slice_in_dim(col_a, x0, B, 0)
        w = ok.astype(jnp.float32)
        w_new = w_old + w
        denom = jnp.maximum(w_new, 1.0)
        s_new = jnp.where(ok, (s_old * w_old + d) / denom, s_old)
        c_new = jnp.where(ok[:, None],
                          (c_old * w_old[:, None] + c_s) / denom[:, None],
                          c_old)
        sdf_a = jax.lax.dynamic_update_slice_in_dim(sdf_a, s_new, x0, 0)
        w_a = jax.lax.dynamic_update_slice_in_dim(w_a, w_new, x0, 0)
        col_a = jax.lax.dynamic_update_slice_in_dim(col_a, c_new, x0, 0)
        return (sdf_a, w_a, col_a), None

    (sdf_acc, w_acc, col_acc), _ = jax.lax.scan(
        slab, (sdf_acc, w_acc, col_acc), jnp.arange(nb, dtype=jnp.int32))
    return sdf_acc, w_acc, col_acc


def fuse_sdf_points_views(pts: jnp.ndarray, trunc: jnp.ndarray,
                          depths: jnp.ndarray, colors: jnp.ndarray,
                          alphas: jnp.ndarray, world_views: jnp.ndarray,
                          fxs: jnp.ndarray, fys: jnp.ndarray,
                          width: int, height: int):
    """All-views free-point projective SDF fusion in ONE device program.

    Same math as fuse_sdf_points but with the view loop as a lax.scan
    over stacked per-view tensors (depths (V,H,W), colors (V,3,H,W),
    alphas (V,H,W), world_views (V,4,4), fxs/fys (V,)) — one dispatch per
    BLOCK instead of per (block, view), which is what makes block-wise
    1024-res unbounded meshing (render/extract.py) dispatch-bound-free on
    tunneled backends. Returns (sdf, w, col) accumulators for the points.
    """
    V = depths.shape[0]
    tables = jnp.concatenate(
        [depths[..., None], alphas[..., None],
         colors.transpose(0, 2, 3, 1)], -1).reshape(V, -1, 5)

    def view(carry, xs):
        sdf_a, w_a, col_a = carry
        table, wv, fx, fy = xs
        pv = pts @ wv[:3, :3] + wv[3, :3]
        z = pv[:, 2]
        u = pv[:, 0] / jnp.maximum(z, 1e-9) * fx + (width - 1) / 2.0
        v = pv[:, 1] / jnp.maximum(z, 1e-9) * fy + (height - 1) / 2.0
        inb = ((z > 1e-4) & (u >= 0) & (u <= width - 1)
               & (v >= 0) & (v <= height - 1))
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, height - 1)
        s = table[vi * width + ui]                     # (N, 5)
        d_s, a_s, c_s = s[:, 0], s[:, 1], s[:, 2:5]
        sdf = d_s - z
        ok = inb & (a_s > 0.5) & (d_s > 1e-6) & (sdf > -trunc)
        d = jnp.clip(sdf / trunc, -1.0, 1.0)
        w = ok.astype(jnp.float32)
        w_new = w_a + w
        denom = jnp.maximum(w_new, 1.0)
        s_new = jnp.where(ok, (sdf_a * w_a + d) / denom, sdf_a)
        c_new = jnp.where(ok[:, None],
                          (col_a * w_a[:, None] + c_s) / denom[:, None],
                          col_a)
        return (s_new, w_new, c_new), None

    N = pts.shape[0]
    init = (jnp.full((N,), 1.0, jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N, 3), jnp.float32))
    (sdf, w, col), _ = jax.lax.scan(
        view, init, (tables, world_views, fxs, fys))
    return sdf, w, col

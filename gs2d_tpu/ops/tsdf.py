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

        # NEAREST-pixel sampling, as Open3D's integrate does: bilinear
        # depth taps straddling a masked silhouette blend zeros with real
        # depth into bogus fractional depths that still pass validity,
        # carving false crossings around every rim
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, height - 1)
        samp = table[vi * width + ui]
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


def fuse_sdf_points_views(pts: jnp.ndarray, trunc: jnp.ndarray,
                          depths: jnp.ndarray, colors: jnp.ndarray,
                          alphas: jnp.ndarray, world_views: jnp.ndarray,
                          fxs: jnp.ndarray, fys: jnp.ndarray,
                          width: int, height: int):
    """All-views free-point projective SDF fusion in ONE device program.

    Reference compute_sdf_perframe semantics (mesh_utils.py:211-222):
    bilinear border-padded sampling, mask = in-frustum & z>0, PLUS an
    alpha>0.5 gate (documented deviation, see inline note). The view
    loop is a lax.scan over stacked per-view tensors (depths (V,H,W),
    colors (V,3,H,W), alphas (V,H,W), world_views (V,4,4), fxs/fys
    (V,)) — one dispatch per
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
        # reference mask_proj: in-frustum & z>0 only (no alpha / depth
        # validity tests — background depth 0 yields sdf=-z, dropped by
        # the -trunc gate), grid_sample bilinear with BORDER padding
        inb = ((z > 0) & (u >= 0) & (u <= width - 1)
               & (v >= 0) & (v <= height - 1))
        uc = jnp.clip(u, 0.0, width - 1.0)
        vc = jnp.clip(v, 0.0, height - 1.0)
        x0i = jnp.clip(jnp.floor(uc).astype(jnp.int32), 0, width - 2)
        y0i = jnp.clip(jnp.floor(vc).astype(jnp.int32), 0, height - 2)
        fxw = jnp.clip(uc - x0i, 0.0, 1.0)[:, None]
        fyw = jnp.clip(vc - y0i, 0.0, 1.0)[:, None]
        base = y0i * width + x0i
        samp = (table[base] * (1 - fxw) * (1 - fyw)
                + table[base + 1] * fxw * (1 - fyw)
                + table[base + width] * (1 - fxw) * fyw
                + table[base + width + 1] * fxw * fyw)
        d_s, a_s, c_s = samp[:, 0], samp[:, 1], samp[:, 2:5]
        sdf = d_s - z
        # DOCUMENTED DEVIATION from the reference: skip pixels with
        # alpha <= 0.5. The reference fuses the depth map raw — empty
        # background pixels carry depth 0, and any grid point within
        # trunc of a camera then absorbs tsdf=-z/trunc, growing a
        # spurious shell around the camera ring on scenes with empty
        # background (real captures rarely have any, synthetic ones do).
        ok = inb & (a_s > 0.5) & (sdf > -trunc)
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

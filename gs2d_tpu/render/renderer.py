"""Renderer bridge: model state + camera → output dict.

Same output contract as the reference bridge
(/root/reference/gaussian_renderer/__init__.py:114-225): keys render,
rend_alpha, rend_normal (world space), rend_dist, surf_depth, surf_normal,
rend_noise (min-max normalized, gradient-detached), radii,
visibility_filter — plus binning diagnostics. ``screen_offsets`` replaces
the reference's retain_grad() means2D dummy: pass zeros and take
jax.grad w.r.t. them for densification statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import (GaussianState, activated, sh_degree_mask,
                                sh_table_kn)
from ..ops.depth_utils import depth_to_normal
from ..ops.rasterize.api import RasterizeConfig, rasterize
from ..ops.rasterize.preprocess import preprocess
from ..scene.cameras import Camera


def render(camera: Camera, state: GaussianState, cfg: RasterizeConfig,
           bg: jnp.ndarray, *, max_sh_degree: int = 3,
           scaling_modifier: float = 1.0,
           override_color: Optional[jnp.ndarray] = None,
           noise: Optional[jnp.ndarray] = None,
           screen_offsets: Optional[jnp.ndarray] = None,
           depth_ratio: float = 0.0,
           mesh=None):
    xyz, scales, quats, opacity, _ = activated(state.params)
    # inactive slots never rasterize
    opacity = jnp.where(state.active, opacity, 0.0)
    if override_color is None:
        # lane-major (K*3, cap) SH table with the degree ramp applied in
        # the same orientation (the (cap, K, 3) form tile-pads 43x — see
        # ops/sh.py eval_sh_kn)
        kmask = sh_degree_mask(state.active_sh_degree, max_sh_degree)[:, 0]
        shs_kn = sh_table_kn(state.params) * jnp.repeat(kmask, 3)[:, None]
    else:
        shs_kn = None

    pre = preprocess(
        xyz, scales, quats, opacity,
        camera.world_view, camera.full_proj, camera.campos,
        camera.width, camera.height,
        sh_degree=max_sh_degree,
        shs_kn=shs_kn,
        colors=override_color,
        scale_modifier=scaling_modifier,
        screen_offsets=screen_offsets,
        noise=noise,
    )
    pre = pre._replace(visible=pre.visible & state.active,
                       radii=jnp.where(state.active, pre.radii, 0))

    if mesh is not None:
        from ..parallel.data_parallel import rasterize_sharded
        out, aux = rasterize_sharded(pre, cfg, mesh)
    else:
        out, aux = rasterize(pre, cfg)

    alpha = out[4:5]
    rgb = out[0:3] + (1.0 - alpha) * bg[:, None, None]

    # view → world normals (reference :126-127)
    n_view = out[5:8]
    R = camera.world_view[:3, :3]          # row-vector W2V rotation block
    n_world = jnp.einsum("chw,ck->khw", n_view, R.T)

    depth_expected = jnp.nan_to_num(out[3:4] / jnp.maximum(alpha, 1e-12))
    depth_expected = jnp.where(alpha > 0, depth_expected, 0.0)
    depth_median = jnp.nan_to_num(out[8:9])
    surf_depth = (depth_expected * (1.0 - depth_ratio)
                  + depth_ratio * depth_median)

    surf_normal = depth_to_normal(camera, surf_depth)
    surf_normal = surf_normal.transpose(2, 0, 1)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)

    rend_noise = jax.lax.stop_gradient(out[10:13])
    lo = jnp.min(rend_noise)
    hi = jnp.max(rend_noise)
    rend_noise = (rend_noise - lo) / jnp.maximum(hi - lo, 1e-12)

    return {
        "render": rgb,
        "rend_alpha": alpha,
        "rend_normal": n_world,
        "rend_dist": out[9:10],
        "surf_depth": surf_depth,
        "surf_normal": surf_normal,
        "rend_noise": rend_noise,
        "depth_expected": depth_expected,
        "depth_median": depth_median,
        "radii": pre.radii,
        "visibility_filter": pre.radii > 0,
        "num_pairs": aux["num_pairs"],
        "overflow": aux["overflow"],
        "padded_total": aux["padded_total"],
        "num_expanded": aux["num_expanded"],
        "num_rows": aux["num_rows"],
    }

"""Convergence quality gate: overfitting a single view must reach a PSNR
threshold, not merely decrease the loss (a weak loss-decrease check missed
two real training-quality bugs: densify gradients in the wrong units and
bf16-degraded SSIM).

Uses the pure-jnp oracle rasterizer (cfg.impl='oracle') so the whole step
is fast under CPU jit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.ops.ssim import psnr
from gs2d_tpu.render.renderer import render
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step

from .utils import lookat_camera, random_cloud


def test_overfit_reaches_psnr():
    cam = lookat_camera(width=64, height=32, dist=4.0)
    rcfg = RasterizeConfig(width=cam.width, height=cam.height,
                           pairs_capacity=1 << 12, impl="oracle")

    means, scales, quats, opac, rgb, _ = random_cloud(
        25, 5, spread=0.8, scale_lo=0.12, scale_hi=0.3)
    gt_state = init_from_pcd(means, rgb, 32, init_scales=np.log(scales),
                             seed=0)
    logit = np.log(opac / (1 - opac)).astype(np.float32)[:, None]
    gt_state = dataclasses.replace(
        gt_state,
        params=dataclasses.replace(
            gt_state.params,
            rotation=jnp.asarray(np.pad(quats, ((0, 7), (0, 0)))),
            opacity=jnp.asarray(np.pad(logit, ((0, 7), (0, 0))))),
        active_sh_degree=jnp.int32(0))
    bg = jnp.zeros((3,), jnp.float32)
    gt = render(cam, gt_state, rcfg, bg)["render"]

    rng = np.random.default_rng(7)
    init_pts = means + rng.normal(scale=0.04, size=means.shape).astype(
        np.float32)
    state = init_from_pcd(init_pts, rgb * 0.5 + 0.25, 32,
                          init_scales=np.log(scales), seed=1)
    opt_cfg = OptimizationParams(position_lr_init=0.003,
                                 position_lr_final=0.0003)
    step = make_train_step(rcfg, opt_cfg, spatial_lr_scale=1.0)
    ts = TrainState(gaussians=state, opt=init_adam(state.params),
                    key=jax.random.PRNGKey(0))

    for it in range(1, 301):
        ts, metrics = step(ts, cam, gt, jnp.int32(it), bg)

    out = render(cam, ts.gaussians, rcfg, bg)["render"]
    p = float(psnr(out, gt))
    assert p > 26.0, f"overfit PSNR {p:.2f} too low"

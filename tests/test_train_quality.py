"""Convergence quality gate: overfitting a single view must reach a PSNR
threshold, not merely decrease the loss (a weak loss-decrease check missed
two real training-quality bugs: densify gradients in the wrong units and
bf16-degraded SSIM).

Covers BOTH rasterizer implementations (VERDICT r2 item 6): the pure-jnp
oracle at 64x32 (fast under CPU jit) and the Pallas kernels in interpret
mode at 128x64, so kernel-grade numerics — the product-space transmittance
scan, the hand-written VJP, and the 22-column gradient wire — carry a
training-quality assertion, not just per-op parity. The compiled-kernel
equivalent at 256x256 runs on hardware via scripts/quality_gate_pallas.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.ops.ssim import psnr
from gs2d_tpu.render.renderer import render
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step

from .utils import lookat_camera, random_cloud


def overfit_psnr(rcfg: RasterizeConfig, iters: int = 300) -> float:
    """Overfit 25 perturbed splats back onto their own render; return PSNR."""
    cam = lookat_camera(width=rcfg.width, height=rcfg.height, dist=4.0)

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

    for it in range(1, iters + 1):
        ts, _ = step(ts, cam, gt, jnp.int32(it), bg)

    out = render(cam, ts.gaussians, rcfg, bg)["render"]
    return float(psnr(out, gt))


def test_overfit_reaches_psnr():
    rcfg = RasterizeConfig(width=64, height=32, pairs_capacity=1 << 12,
                           impl="oracle")
    p = overfit_psnr(rcfg)
    assert p > 26.0, f"oracle overfit PSNR {p:.2f} too low"


def test_overfit_reaches_psnr_pallas():
    # interpret mode on CPU; measured headroom: reaches ~36.9 dB
    interpret = jax.devices()[0].platform == "cpu"
    rcfg = RasterizeConfig(width=128, height=64, pairs_capacity=1 << 13,
                           impl="pallas", interpret=interpret)
    p = overfit_psnr(rcfg)
    assert p > 30.0, f"pallas overfit PSNR {p:.2f} too low"

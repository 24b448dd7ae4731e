"""SSIM with an 11×11 σ=1.5 Gaussian window.

Numeric contract of /root/reference/utils/loss_utils.py:37-73 (zero-padded
depthwise convolutions, C1=0.01², C2=0.03²). TPU-shaped: the window is
separable, so each blur is two 1-D depthwise convolutions XLA fuses well.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs.astype(np.float64) ** 2) / (2 * sigma ** 2))
    # match the reference's normalize-then-outer-product (float32 rounding)
    g32 = (g / g.sum()).astype(np.float32)
    return g32


def _blur(img: jnp.ndarray, k: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Depthwise separable blur of (C, H, W) with zero padding."""
    C = img.shape[0]
    x = img[None]                                   # (1, C, H, W)
    kh = jnp.tile(k.reshape(1, 1, -1, 1), (C, 1, 1, 1))
    kw = jnp.tile(k.reshape(1, 1, 1, -1), (C, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    # precision HIGHEST: bf16 conv rounding makes blur(x*x) - mu^2 go
    # negative on flat regions, exploding the SSIM ratio on TPU
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=C, precision=hi)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=C, precision=hi)
    return x[0]


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair in [0, 1]."""
    k = jnp.asarray(_gauss_kernel(window_size, 1.5))
    pad = window_size // 2
    blur = functools.partial(_blur, k=k, pad=pad)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def smooth_loss(disp, img):
    """Edge-aware second-order smoothness (reference loss_utils.py:28-35;
    present for capability parity, unused by the default training loss)."""
    gdx = jnp.abs(disp[:, 1:-1, :-2] + disp[:, 1:-1, 2:]
                  - 2 * disp[:, 1:-1, 1:-1])
    gdy = jnp.abs(disp[:, :-2, 1:-1] + disp[:, 2:, 1:-1]
                  - 2 * disp[:, 1:-1, 1:-1])
    gix = jnp.mean(jnp.abs(img[:, 1:-1, :-2] - img[:, 1:-1, 2:]),
                   0, keepdims=True) * 0.5
    giy = jnp.mean(jnp.abs(img[:, :-2, 1:-1] - img[:, 2:, 1:-1]),
                   0, keepdims=True) * 0.5
    return jnp.mean(gdx * jnp.exp(-gix)) + jnp.mean(gdy * jnp.exp(-giy))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))

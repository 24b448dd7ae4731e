"""LPIPS perceptual metric (VGG16 backbone) in jnp.

Capability of the reference's vendored lpipsPyTorch/ (SURVEY.md §2.3):
VGG16 features at relu1_2..relu5_3, unit-normalized along channels,
squared differences reduced by learned 1×1 linear heads, averaged over
space and layers.

The zero-egress environment cannot download pretrained weights, so
weights load from a local npz (env GS2D_LPIPS_WEIGHTS or argument) with
arrays `conv{i}_w`, `conv{i}_b` for the 13 VGG convs and `lin{j}` for the
5 linear heads (convertible from torchvision + lpips checkpoints with
scripts/convert_lpips_weights.py). Without weights, `available()` is
False and callers must skip LPIPS (reported as null).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [(64, False), (64, False), (128, True), (128, False),
             (256, True), (256, False), (256, False), (512, True),
             (512, False), (512, False), (512, True), (512, False),
             (512, False)]
# indices (into conv list) after whose relu we tap features
_TAPS = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights_path: Optional[str] = None):
        weights_path = weights_path or os.environ.get("GS2D_LPIPS_WEIGHTS")
        self.params = None
        if weights_path and os.path.exists(weights_path):
            z = np.load(weights_path)
            self.params = {k: jnp.asarray(z[k]) for k in z.files}

    def available(self) -> bool:
        return self.params is not None

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (3, H, W) in [0, 1]. Returns scalar LPIPS distance."""
        assert self.available(), "LPIPS weights not loaded"
        return _lpips_fn(self.params, x, y)


@jax.jit
def _lpips_fn(params, x, y):
    def feats(img):
        # NOTE: the reference's vendored lpipsPyTorch z-scores the [0,1]
        # image directly (modules/networks.py:49-56) — it does NOT apply
        # upstream richzhang's [0,1]→[-1,1] remap. Protocol comparability
        # with the reference's published tables requires matching that.
        h = (img - _SHIFT[:, None, None]) / _SCALE[:, None, None]
        h = h[None]                                    # (1, C, H, W)
        taps = []
        for i, (_, pool) in enumerate(_VGG_PLAN):
            if pool:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
            w = params[f"conv{i}_w"]                   # (O, I, 3, 3)
            b = params[f"conv{i}_b"]
            dn = jax.lax.conv_dimension_numbers(
                h.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            h = jax.nn.relu(h + b[None, :, None, None])
            if i in _TAPS:
                taps.append(h)
        return taps

    fx = feats(x)
    fy = feats(y)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        # x / (||x|| + eps), the exact normalize_activation form of the
        # reference (lpipsPyTorch/modules/utils.py:6-8)
        na = a / (jnp.sqrt(jnp.sum(a * a, 1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, 1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        lin = params[f"lin{j}"].reshape(1, -1, 1, 1)   # (1, C, 1, 1) ≥ 0
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total

"""Weight-gated loader: HF diffusers safetensors → sdnet/vae param dicts.

The image is zero-egress, so checkpoints (timbrooks/instruct-pix2pix)
cannot be fetched; like eval/lpips.py, the architecture is fully
implemented and tested with random weights, and this loader activates the
pretrained path when a local snapshot exists. Point ``GS2D_SD_WEIGHTS``
(or the explicit argument) at a diffusers model directory:

    <root>/unet/diffusion_pytorch_model.safetensors
    <root>/vae/diffusion_pytorch_model.safetensors

Names in the safetensors ARE the param-dict keys (sdnet.py/vae.py follow
the diffusers state-dict naming), so loading is read + shape-check only.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .sdnet import SD15_IP2P_UNET, UNetConfig, unet_param_shapes
from .vae import SD15_VAE, VAEConfig, vae_param_shapes

ENV_VAR = "GS2D_SD_WEIGHTS"


def weights_root(root: str | None = None) -> str | None:
    env = os.environ.get(ENV_VAR)
    root = root or env
    if root and os.path.isdir(root):
        return root
    if root:
        # set but wrong — surface the typo instead of the generic
        # "no SD weights" message downstream
        raise FileNotFoundError(
            f"{ENV_VAR or 'weights_root'} points at {root!r}, which is "
            "not a directory")
    return None


def _load_safetensors(path: str) -> dict:
    from safetensors.numpy import load_file
    return load_file(path)


# The published timbrooks/instruct-pix2pix VAE was exported by an old
# diffusers whose AttentionBlock stored mid-block attention as
# {query,key,value,proj_attn}; modern diffusers remaps these at load
# (_convert_deprecated_attention_blocks). Same remap here.
_LEGACY_ATTN = {".to_q.": ".query.", ".to_k.": ".key.",
                ".to_v.": ".value.", ".to_out.0.": ".proj_attn."}


def _legacy_name(name: str):
    for new, old in _LEGACY_ATTN.items():
        if new in name:
            return name.replace(new, old)
    return None


def _to_params(raw: dict, shapes: dict, what: str) -> dict:
    raw = dict(raw)
    for name in shapes:
        if name not in raw:
            legacy = _legacy_name(name)
            if legacy is not None and legacy in raw:
                arr = raw[legacy]
                # legacy attention projections are (C, C, 1, 1) convs or
                # (C, C) linears depending on exporter; squeeze to match
                want = shapes[name]
                if tuple(arr.shape) != tuple(want) and \
                        tuple(arr.shape[:2]) == tuple(want[:2]):
                    arr = arr.reshape(want)
                raw[name] = arr
    missing = sorted(set(shapes) - set(raw))
    if missing:
        raise ValueError(
            f"{what}: checkpoint is missing {len(missing)} params, "
            f"first: {missing[:5]}")
    p = {}
    for name, shape in shapes.items():
        arr = np.asarray(raw[name])
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(
                f"{what}: {name} has shape {arr.shape}, expected {shape}")
        p[name] = jnp.asarray(arr, jnp.float32)
    return p


def load_unet(root: str, cfg: UNetConfig = SD15_IP2P_UNET) -> dict:
    path = os.path.join(root, "unet", "diffusion_pytorch_model.safetensors")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"UNet checkpoint not found at {path}; set {ENV_VAR} to a "
            "diffusers snapshot of timbrooks/instruct-pix2pix")
    return _to_params(_load_safetensors(path), unet_param_shapes(cfg),
                      "unet")


def load_vae(root: str, cfg: VAEConfig = SD15_VAE) -> dict:
    path = os.path.join(root, "vae", "diffusion_pytorch_model.safetensors")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"VAE checkpoint not found at {path}; set {ENV_VAR} to a "
            "diffusers snapshot of timbrooks/instruct-pix2pix")
    return _to_params(_load_safetensors(path), vae_param_shapes(cfg), "vae")

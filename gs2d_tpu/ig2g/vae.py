"""Stable-Diffusion AutoencoderKL in pure jnp (weight-gated).

The VAE boundary the reference editor crosses at
/root/reference/ig2g/ip2p.py:403-504 (``imgs_to_latent`` encodes with
posterior *sampling*, ``prepare_image_latents`` with the *mode*, both
scaled by 0.18215; ``latents_to_img`` decodes). Same conventions here:
HF-named flat params, NCHW/OIHW torch layout, shape-polymorphic config
(tiny random configs in tests, SD-1.5 constant for real weights).

The 8x spatial downsample (512² image → 64² latent) is the geometry the
rendered-noise initialization depends on; tests drive it via TINY_VAE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .sdnet import (_conv, _group_norm, _linear, _silu, _upsample_nearest2,
                    init_params)

SD_LATENT_SCALE = 0.18215     # reference ip2p.py:52 CONST_SCALE


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32

    @property
    def n_blocks(self):
        return len(self.block_out_channels)

    @property
    def downsample_factor(self):
        return 2 ** (self.n_blocks - 1)


SD15_VAE = VAEConfig()
# 8x downsample preserved (4 blocks) with tiny widths for tests.
TINY_VAE = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                     norm_groups=4)


def _resnet(cfg, p, name, x):
    h = _group_norm(p, f"{name}.norm1", x, cfg.norm_groups, eps=1e-6)
    h = _conv(p, f"{name}.conv1", _silu(h))
    h = _group_norm(p, f"{name}.norm2", h, cfg.norm_groups, eps=1e-6)
    h = _conv(p, f"{name}.conv2", _silu(h))
    if f"{name}.conv_shortcut.weight" in p:
        x = _conv(p, f"{name}.conv_shortcut", x, padding=0)
    return x + h


def _mid_attn(cfg, p, name, x):
    """Single-head spatial self-attention at the bottleneck."""
    B, C, H, W = x.shape
    h = _group_norm(p, f"{name}.group_norm", x, cfg.norm_groups, eps=1e-6)
    h = h.reshape(B, C, H * W).transpose(0, 2, 1)
    q = _linear(p, f"{name}.to_q", h)
    k = _linear(p, f"{name}.to_k", h)
    v = _linear(p, f"{name}.to_v", h)
    a = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(C), axis=-1)
    o = _linear(p, f"{name}.to_out.0", a @ v)
    return x + o.transpose(0, 2, 1).reshape(B, C, H, W)


def _mid(cfg, p, name, x):
    x = _resnet(cfg, p, f"{name}.resnets.0", x)
    x = _mid_attn(cfg, p, f"{name}.attentions.0", x)
    return _resnet(cfg, p, f"{name}.resnets.1", x)


def vae_encode_moments(cfg: VAEConfig, p: dict, img: jnp.ndarray):
    """img (B,3,H,W) in [-1,1] → (mean, logvar) each (B,4,H/8,W/8)."""
    x = _conv(p, "encoder.conv_in", img)
    for i in range(cfg.n_blocks):
        name = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            x = _resnet(cfg, p, f"{name}.resnets.{j}", x)
        if i < cfg.n_blocks - 1:
            # diffusers VAE downsample: asymmetric (0,1,0,1) pad, stride 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
            x = _conv(p, f"{name}.downsamplers.0.conv", x, stride=2,
                      padding=0)
    x = _mid(cfg, p, "encoder.mid_block", x)
    x = _group_norm(p, "encoder.conv_norm_out", x, cfg.norm_groups, eps=1e-6)
    x = _conv(p, "encoder.conv_out", _silu(x))
    moments = _conv(p, "quant_conv", x, padding=0)
    return jnp.split(moments, 2, axis=1)


def vae_sample(mean, logvar, key):
    """Reparameterized posterior sample with the diffusers logvar clip
    (the ONE place the clipping bounds / sampling convention live —
    JaxSDBackend.encode and vae_encode both call it)."""
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(key, mean.shape)


def vae_encode(cfg, p, img, key=None):
    """Posterior sample (key given) or mode (key None), unscaled."""
    mean, logvar = vae_encode_moments(cfg, p, img)
    if key is None:
        return mean
    return vae_sample(mean, logvar, key)


def vae_decode(cfg: VAEConfig, p: dict, lat: jnp.ndarray) -> jnp.ndarray:
    """lat (B,4,h,w) unscaled → image (B,3,8h,8w) in [-1,1]."""
    x = _conv(p, "post_quant_conv", lat, padding=0)
    x = _conv(p, "decoder.conv_in", x)
    x = _mid(cfg, p, "decoder.mid_block", x)
    rev = list(reversed(cfg.block_out_channels))
    for i in range(cfg.n_blocks):
        name = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            x = _resnet(cfg, p, f"{name}.resnets.{j}", x)
        if i < cfg.n_blocks - 1:
            x = _upsample_nearest2(x)
            x = _conv(p, f"{name}.upsamplers.0.conv", x)
    x = _group_norm(p, "decoder.conv_norm_out", x, cfg.norm_groups, eps=1e-6)
    return _conv(p, "decoder.conv_out", _silu(x))


def vae_param_shapes(cfg: VAEConfig) -> dict:
    s = {}

    def conv(name, ci, co, k=3):
        s[f"{name}.weight"] = (co, ci, k, k)
        s[f"{name}.bias"] = (co,)

    def lin(name, ci, co):
        s[f"{name}.weight"] = (co, ci)
        s[f"{name}.bias"] = (co,)

    def norm(name, c):
        s[f"{name}.weight"] = (c,)
        s[f"{name}.bias"] = (c,)

    def resnet(name, ci, co):
        norm(f"{name}.norm1", ci)
        conv(f"{name}.conv1", ci, co)
        norm(f"{name}.norm2", co)
        conv(f"{name}.conv2", co, co)
        if ci != co:
            conv(f"{name}.conv_shortcut", ci, co, k=1)

    def mid(name, c):
        resnet(f"{name}.resnets.0", c, c)
        norm(f"{name}.attentions.0.group_norm", c)
        for q in ("to_q", "to_k", "to_v"):
            lin(f"{name}.attentions.0.{q}", c, c)
        lin(f"{name}.attentions.0.to_out.0", c, c)
        resnet(f"{name}.resnets.1", c, c)

    ch = cfg.block_out_channels
    conv("encoder.conv_in", cfg.in_channels, ch[0])
    c_in = ch[0]
    for i in range(cfg.n_blocks):
        name = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            resnet(f"{name}.resnets.{j}", c_in if j == 0 else ch[i], ch[i])
        c_in = ch[i]
        if i < cfg.n_blocks - 1:
            conv(f"{name}.downsamplers.0.conv", ch[i], ch[i])
    mid("encoder.mid_block", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", ch[-1], 2 * cfg.latent_channels)
    conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    conv("decoder.conv_in", cfg.latent_channels, ch[-1])
    mid("decoder.mid_block", ch[-1])
    rev = list(reversed(ch))
    c_in = rev[0]
    for i in range(cfg.n_blocks):
        name = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            resnet(f"{name}.resnets.{j}", c_in if j == 0 else rev[i], rev[i])
        c_in = rev[i]
        if i < cfg.n_blocks - 1:
            conv(f"{name}.upsamplers.0.conv", rev[i], rev[i])
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", rev[-1], cfg.in_channels)
    return s


__all__ = ["VAEConfig", "SD15_VAE", "TINY_VAE", "SD_LATENT_SCALE",
           "vae_encode", "vae_encode_moments", "vae_decode",
           "vae_param_shapes", "init_params"]

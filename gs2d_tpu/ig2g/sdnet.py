"""Stable-Diffusion-class conditional UNet in pure jnp (weight-gated).

A from-scratch functional implementation of the UNet2DCondition
architecture the reference's editing fork drives
(/root/reference/ig2g/ip2p.py:138-158 loads timbrooks/instruct-pix2pix;
the vendored diffusers adds ``forward_intermediate`` returning the
down-path skip stack at lib/diffusers-0.30.2/.../unet_2d_condition.py:1552
and ``forward_fused`` blending two passes' skips
``res1*(1-lam) + res2*lam`` at :1795). This module reproduces those three
entry points plus FreeU skip/backbone scaling (``pipe.enable_freeu`` at
ip2p.py:167-168) TPU-natively:

 * parameters live in a FLAT dict keyed by the HuggingFace diffusers
   state-dict names (``down_blocks.0.attentions.0...``), so pretrained
   safetensors load with zero renaming (sd_weights.py);
 * convolutions run NCHW/OIHW — the torch layout — so loaded weights are
   used as-is; XLA re-layouts internally for the MXU;
 * everything is shape-polymorphic over ``UNetConfig`` so tests exercise
   the full architecture with tiny random weights (no checkpoints in the
   image), and the real SD-1.5 config is one constant away.

No torch, no diffusers — jnp only, jit/grad-safe.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 / InstructPix2Pix UNet2DCondition hyperparameters."""
    in_channels: int = 8            # 4 latent + 4 image-cond (IP2P concat)
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_attention_heads: int = 8
    norm_groups: int = 32

    @property
    def n_blocks(self):
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4


# InstructPix2Pix (timbrooks/instruct-pix2pix) == SD-1.5 UNet with 8
# input channels.
SD15_IP2P_UNET = UNetConfig()
# Tiny config for tests: full architecture, ~100k params.
TINY_UNET = UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                       cross_attention_dim=16, num_attention_heads=2,
                       norm_groups=4)


@dataclasses.dataclass(frozen=True)
class FreeUParams:
    """FreeU backbone/skip scaling (arXiv 2309.11497; reference enables it
    via pipe.enable_freeu(s1, s2, b1, b2), ip2p.py:167-168)."""
    s1: float = 0.9
    s2: float = 0.2
    b1: float = 1.2
    b2: float = 1.4


# --------------------------------------------------------------------------
# primitive layers (params: flat dict of torch-layout arrays)
# --------------------------------------------------------------------------

def _conv(p, name, x, stride=1, padding=1):
    w = p[f"{name}.weight"]                     # (O, I, kh, kw)
    pad = ((padding, padding), (padding, padding)) \
        if isinstance(padding, int) else padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def _linear(p, name, x):
    y = x @ p[f"{name}.weight"].T
    b = p.get(f"{name}.bias")
    return y + b if b is not None else y


def _group_norm(p, name, x, groups, eps=1e-5):
    B, C, H, W = x.shape
    xg = x.reshape(B, groups, C // groups, H, W)
    mean = xg.mean(axis=(2, 3, 4), keepdims=True)
    var = xg.var(axis=(2, 3, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, C, H, W)
    return x * p[f"{name}.weight"][None, :, None, None] \
        + p[f"{name}.bias"][None, :, None, None]


def _layer_norm(p, name, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p[f"{name}.weight"] + p[f"{name}.bias"]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def timestep_embedding(t, dim, max_period=10000.0):
    """Sinusoidal embedding, diffusers convention for SD (freq_shift=0,
    flip_sin_to_cos=True → [cos | sin])."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = jnp.asarray(t, jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _attention(p, name, x, ctx, heads):
    """x: (B, T, C) queries; ctx: (B, S, D) keys/values source."""
    q = _linear(p, f"{name}.to_q", x)
    k = _linear(p, f"{name}.to_k", ctx)
    v = _linear(p, f"{name}.to_v", ctx)
    B, T, C = q.shape
    S = k.shape[1]
    dh = C // heads
    q = q.reshape(B, T, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    a = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dh)
    a = jax.nn.softmax(a, axis=-1)
    o = jnp.einsum("bhts,bhsd->bhtd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
    return _linear(p, f"{name}.to_out.0", o)


def _geglu_ff(p, name, x):
    h = _linear(p, f"{name}.net.0.proj", x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return _linear(p, f"{name}.net.2", h)


def _transformer_block(p, name, x, ctx, heads):
    h = _layer_norm(p, f"{name}.norm1", x)
    x = x + _attention(p, f"{name}.attn1", h, h, heads)
    x = x + _attention(p, f"{name}.attn2", _layer_norm(p, f"{name}.norm2", x),
                       ctx, heads)
    x = x + _geglu_ff(p, f"{name}.ff", _layer_norm(p, f"{name}.norm3", x))
    return x


def _spatial_transformer(cfg, p, name, x, ctx):
    """Transformer2DModel: GN → 1x1 conv in → blocks → 1x1 conv out + res."""
    B, C, H, W = x.shape
    res = x
    x = _group_norm(p, f"{name}.norm", x, cfg.norm_groups, eps=1e-6)
    x = _conv(p, f"{name}.proj_in", x, padding=0)
    x = x.reshape(B, C, H * W).transpose(0, 2, 1)          # (B, T, C)
    x = _transformer_block(p, f"{name}.transformer_blocks.0", x, ctx,
                           cfg.num_attention_heads)
    x = x.transpose(0, 2, 1).reshape(B, C, H, W)
    x = _conv(p, f"{name}.proj_out", x, padding=0)
    return x + res


def _resnet(cfg, p, name, x, temb):
    h = _group_norm(p, f"{name}.norm1", x, cfg.norm_groups)
    h = _conv(p, f"{name}.conv1", _silu(h))
    h = h + _linear(p, f"{name}.time_emb_proj", _silu(temb))[:, :, None, None]
    h = _group_norm(p, f"{name}.norm2", h, cfg.norm_groups)
    h = _conv(p, f"{name}.conv2", _silu(h))
    if f"{name}.conv_shortcut.weight" in p:
        x = _conv(p, f"{name}.conv_shortcut", x, padding=0)
    return x + h


def _upsample_nearest2(x):
    B, C, H, W = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (B, C, H, 2, W, 2))
    return x.reshape(B, C, 2 * H, 2 * W)


def _fourier_filter(x, threshold, scale):
    """FreeU skip filtering: scale the centered low-frequency
    (2·threshold)² box of the 2-D spectrum by ``scale``."""
    B, C, H, W = x.shape
    f = jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1))
    crow, ccol = H // 2, W // 2
    mask = jnp.ones((H, W), jnp.float32)
    mask = mask.at[crow - threshold:crow + threshold,
                   ccol - threshold:ccol + threshold].set(scale)
    f = f * mask
    return jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(-2, -1))))


def _apply_freeu(freeu: FreeUParams, stage, h, skip):
    """diffusers apply_freeu: at up stage 0/1 scale the first half of the
    backbone channels by b1/b2 and low-pass-scale the skip by s1/s2."""
    if freeu is None or stage > 1:
        return h, skip
    b = freeu.b1 if stage == 0 else freeu.b2
    s = freeu.s1 if stage == 0 else freeu.s2
    half = h.shape[1] // 2
    h = jnp.concatenate([h[:, :half] * b, h[:, half:]], axis=1)
    skip = _fourier_filter(skip, 1, s)
    return h, skip


# --------------------------------------------------------------------------
# UNet forward
# --------------------------------------------------------------------------

def _down_path(cfg, p, sample, temb, ctx):
    """conv_in + down blocks. Returns (bottom sample, skip stack)."""
    sample = _conv(p, "conv_in", sample)
    skips = [sample]
    for i in range(cfg.n_blocks):
        name = f"down_blocks.{i}"
        has_attn = i < cfg.n_blocks - 1
        for j in range(cfg.layers_per_block):
            sample = _resnet(cfg, p, f"{name}.resnets.{j}", sample, temb)
            if has_attn:
                sample = _spatial_transformer(
                    cfg, p, f"{name}.attentions.{j}", sample, ctx)
            skips.append(sample)
        if i < cfg.n_blocks - 1:
            sample = _conv(p, f"{name}.downsamplers.0.conv", sample, stride=2)
            skips.append(sample)
    return sample, skips


def _mid(cfg, p, sample, temb, ctx):
    sample = _resnet(cfg, p, "mid_block.resnets.0", sample, temb)
    sample = _spatial_transformer(cfg, p, "mid_block.attentions.0",
                                  sample, ctx)
    return _resnet(cfg, p, "mid_block.resnets.1", sample, temb)


def _up_path(cfg, p, sample, skips, temb, ctx,
             skips2=None, lam=0.0, freeu=None):
    """Up blocks consuming the skip stack; optional second stack blended
    ``skip1*(1-lam) + skip2*lam`` (the fork's forward_fused contract,
    unet_2d_condition.py:1795)."""
    for i in range(cfg.n_blocks):
        name = f"up_blocks.{i}"
        # SD: up block 0 is plain (mirrors last down block), rest cross-attn
        has_attn = i != 0
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            if skips2 is not None:
                skip = skip * (1.0 - lam) + skips2.pop() * lam
            sample, skip = _apply_freeu(freeu, i, sample, skip)
            sample = jnp.concatenate([sample, skip], axis=1)
            sample = _resnet(cfg, p, f"{name}.resnets.{j}", sample, temb)
            if has_attn:
                sample = _spatial_transformer(
                    cfg, p, f"{name}.attentions.{j}", sample, ctx)
        if i < cfg.n_blocks - 1:
            sample = _upsample_nearest2(sample)
            sample = _conv(p, f"{name}.upsamplers.0.conv", sample)
    return sample


def _time_embed(cfg, p, t, batch):
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (batch,))
    temb = timestep_embedding(t, cfg.block_out_channels[0])
    temb = _linear(p, "time_embedding.linear_1", temb)
    return _linear(p, "time_embedding.linear_2", _silu(temb))


def unet_apply(cfg: UNetConfig, p: dict, sample: jnp.ndarray, t,
               ctx: jnp.ndarray, freeu: Optional[FreeUParams] = None
               ) -> jnp.ndarray:
    """Full eps prediction. sample: (B, in_ch, H, W); ctx: (B, S, D)."""
    temb = _time_embed(cfg, p, t, sample.shape[0])
    sample, skips = _down_path(cfg, p, sample, temb, ctx)
    sample = _mid(cfg, p, sample, temb, ctx)
    sample = _up_path(cfg, p, sample, skips, temb, ctx, freeu=freeu)
    sample = _group_norm(p, "conv_norm_out", sample, cfg.norm_groups)
    return _conv(p, "conv_out", _silu(sample))


def unet_apply_intermediate(cfg: UNetConfig, p: dict, sample, t, ctx):
    """The fork's forward_intermediate: run the down path and return the
    skip stack (unet_2d_condition.py:1552 returns down_block_res_samples)."""
    temb = _time_embed(cfg, p, t, sample.shape[0])
    _, skips = _down_path(cfg, p, sample, temb, ctx)
    return skips


def unet_apply_fused(cfg: UNetConfig, p: dict, sample, skips2, lam, t, ctx,
                     freeu: Optional[FreeUParams] = None) -> jnp.ndarray:
    """The fork's forward_fused: full forward whose up-path skips are
    ``own*(1-lam) + skips2*lam`` (unet_2d_condition.py:1795)."""
    temb = _time_embed(cfg, p, t, sample.shape[0])
    sample, skips = _down_path(cfg, p, sample, temb, ctx)
    sample = _mid(cfg, p, sample, temb, ctx)
    sample = _up_path(cfg, p, sample, skips, temb, ctx,
                      skips2=list(skips2), lam=lam, freeu=freeu)
    sample = _group_norm(p, "conv_norm_out", sample, cfg.norm_groups)
    return _conv(p, "conv_out", _silu(sample))


# --------------------------------------------------------------------------
# parameter shape spec + random init (tests run the real architecture
# with tiny random weights; the loader validates checkpoints against the
# same spec)
# --------------------------------------------------------------------------

def unet_param_shapes(cfg: UNetConfig) -> dict:
    s = {}

    def conv(name, ci, co, k=3):
        s[f"{name}.weight"] = (co, ci, k, k)
        s[f"{name}.bias"] = (co,)

    def lin(name, ci, co, bias=True):
        s[f"{name}.weight"] = (co, ci)
        if bias:
            s[f"{name}.bias"] = (co,)

    def norm(name, c):
        s[f"{name}.weight"] = (c,)
        s[f"{name}.bias"] = (c,)

    def resnet(name, ci, co):
        norm(f"{name}.norm1", ci)
        conv(f"{name}.conv1", ci, co)
        lin(f"{name}.time_emb_proj", cfg.time_embed_dim, co)
        norm(f"{name}.norm2", co)
        conv(f"{name}.conv2", co, co)
        if ci != co:
            conv(f"{name}.conv_shortcut", ci, co, k=1)

    def xformer(name, c):
        norm(f"{name}.norm", c)
        conv(f"{name}.proj_in", c, c, k=1)
        tb = f"{name}.transformer_blocks.0"
        for ln in ("norm1", "norm2", "norm3"):
            norm(f"{tb}.{ln}", c)
        lin(f"{tb}.attn1.to_q", c, c, bias=False)
        lin(f"{tb}.attn1.to_k", c, c, bias=False)
        lin(f"{tb}.attn1.to_v", c, c, bias=False)
        lin(f"{tb}.attn1.to_out.0", c, c)
        lin(f"{tb}.attn2.to_q", c, c, bias=False)
        lin(f"{tb}.attn2.to_k", cfg.cross_attention_dim, c, bias=False)
        lin(f"{tb}.attn2.to_v", cfg.cross_attention_dim, c, bias=False)
        lin(f"{tb}.attn2.to_out.0", c, c)
        lin(f"{tb}.ff.net.0.proj", c, 8 * c)
        lin(f"{tb}.ff.net.2", 4 * c, c)
        conv(f"{name}.proj_out", c, c, k=1)

    ch = cfg.block_out_channels
    conv("conv_in", cfg.in_channels, ch[0])
    lin("time_embedding.linear_1", ch[0], cfg.time_embed_dim)
    lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)

    c_in = ch[0]
    for i in range(cfg.n_blocks):
        name = f"down_blocks.{i}"
        has_attn = i < cfg.n_blocks - 1
        for j in range(cfg.layers_per_block):
            resnet(f"{name}.resnets.{j}", c_in if j == 0 else ch[i], ch[i])
            if has_attn:
                xformer(f"{name}.attentions.{j}", ch[i])
        c_in = ch[i]
        if i < cfg.n_blocks - 1:
            conv(f"{name}.downsamplers.0.conv", ch[i], ch[i])

    resnet("mid_block.resnets.0", ch[-1], ch[-1])
    xformer("mid_block.attentions.0", ch[-1])
    resnet("mid_block.resnets.1", ch[-1], ch[-1])

    rev = list(reversed(ch))
    out_c = rev[0]
    for i in range(cfg.n_blocks):
        name = f"up_blocks.{i}"
        prev_c = out_c
        out_c = rev[i]
        in_c = rev[min(i + 1, cfg.n_blocks - 1)]
        has_attn = i != 0
        for j in range(cfg.layers_per_block + 1):
            skip_c = in_c if j == cfg.layers_per_block else out_c
            res_in = (prev_c if j == 0 else out_c) + skip_c
            resnet(f"{name}.resnets.{j}", res_in, out_c)
            if has_attn:
                xformer(f"{name}.attentions.{j}", out_c)
        if i < cfg.n_blocks - 1:
            conv(f"{name}.upsamplers.0.conv", out_c, out_c)

    norm("conv_norm_out", ch[0])
    conv("conv_out", ch[0], cfg.out_channels)
    return s


def init_params(shapes: dict, key, scale=0.1) -> dict:
    """Random params for tests: normals for weights, zeros for biases,
    ones for norm weights."""
    p = {}
    for name, shape in sorted(shapes.items()):
        key, sub = jax.random.split(key)
        if name.endswith(".bias"):
            p[name] = jnp.zeros(shape, jnp.float32)
        elif len(shape) == 1:
            p[name] = jnp.ones(shape, jnp.float32)
        else:
            p[name] = scale * jax.random.normal(sub, shape, jnp.float32) \
                / math.sqrt(max(1, shape[1] if len(shape) == 2
                                else shape[1] * shape[2] * shape[3]))
    return p

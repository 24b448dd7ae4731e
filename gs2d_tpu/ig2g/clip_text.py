"""CLIP text encoder (SD-1.5's conditioning tower) in pure jnp.

Provides the ``text_embeddings`` the editor's cross-attention consumes —
the reference gets them from ``pipe._encode_prompt`` (train_ig2g.py:236
in /root/reference). Same weight-gating as sdnet/vae: HF-named flat
params from ``<root>/text_encoder/model.safetensors``; tokenization uses
the snapshot's tokenizer files via transformers (vocab only, no weights).

Architecture (openai/clip-vit-large-patch14 text tower): token + learned
position embeddings → N pre-LN transformer layers with causal masking and
quick-gelu MLPs → final LayerNorm. IP2P conditioning uses the full
last-hidden-state sequence (77 tokens).
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77


SD15_CLIP = CLIPTextConfig()
TINY_CLIP = CLIPTextConfig(vocab_size=64, hidden=16, layers=2, heads=2,
                           max_positions=8)


def _ln(p, name, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p[f"{name}.weight"] + p[f"{name}.bias"]


def _lin(p, name, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_text_apply(cfg: CLIPTextConfig, p: dict,
                    ids: jnp.ndarray) -> jnp.ndarray:
    """ids (B, T) int32 → last hidden state (B, T, hidden)."""
    B, T = ids.shape
    pre = "text_model"
    x = p[f"{pre}.embeddings.token_embedding.weight"][ids]
    x = x + p[f"{pre}.embeddings.position_embedding.weight"][:T]
    # causal mask
    mask = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9)
    dh = cfg.hidden // cfg.heads
    for i in range(cfg.layers):
        ln = f"{pre}.encoder.layers.{i}"
        h = _ln(p, f"{ln}.layer_norm1", x)
        q = _lin(p, f"{ln}.self_attn.q_proj", h)
        k = _lin(p, f"{ln}.self_attn.k_proj", h)
        v = _lin(p, f"{ln}.self_attn.v_proj", h)
        q = q.reshape(B, T, cfg.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, cfg.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, cfg.heads, dh).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dh)
        a = jax.nn.softmax(a + mask, axis=-1)
        o = jnp.einsum("bhts,bhsd->bhtd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, cfg.hidden)
        x = x + _lin(p, f"{ln}.self_attn.out_proj", o)
        h = _ln(p, f"{ln}.layer_norm2", x)
        h = _quick_gelu(_lin(p, f"{ln}.mlp.fc1", h))
        x = x + _lin(p, f"{ln}.mlp.fc2", h)
    return _ln(p, f"{pre}.final_layer_norm", x)


def clip_param_shapes(cfg: CLIPTextConfig) -> dict:
    s = {}
    pre = "text_model"
    s[f"{pre}.embeddings.token_embedding.weight"] = (cfg.vocab_size,
                                                     cfg.hidden)
    s[f"{pre}.embeddings.position_embedding.weight"] = (cfg.max_positions,
                                                        cfg.hidden)

    def lin(name, ci, co):
        s[f"{name}.weight"] = (co, ci)
        s[f"{name}.bias"] = (co,)

    def norm(name):
        s[f"{name}.weight"] = (cfg.hidden,)
        s[f"{name}.bias"] = (cfg.hidden,)

    for i in range(cfg.layers):
        ln = f"{pre}.encoder.layers.{i}"
        norm(f"{ln}.layer_norm1")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{ln}.self_attn.{proj}", cfg.hidden, cfg.hidden)
        norm(f"{ln}.layer_norm2")
        lin(f"{ln}.mlp.fc1", cfg.hidden, 4 * cfg.hidden)
        lin(f"{ln}.mlp.fc2", 4 * cfg.hidden, cfg.hidden)
    norm(f"{pre}.final_layer_norm")
    return s


class PromptEncoder:
    """Weight-gated prompt → (3, 77, hidden) embeddings for the 3-way CFG
    batch [text, uncond, uncond] (text/image/uncond rows must align with
    image_cond_latents [cond, cond, zero] in ip2p.edit_image)."""

    def __init__(self, root: str, cfg: CLIPTextConfig = SD15_CLIP,
                 params: dict | None = None, tokenizer=None):
        self.cfg = cfg
        if params is None:
            from safetensors.numpy import load_file

            from .sd_weights import _to_params
            path = os.path.join(root, "text_encoder", "model.safetensors")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"CLIP text encoder not found at {path}")
            # _to_params gives the missing-key report and shape checks a
            # bare raw[k] lookup lacks (a wrong-variant text tower with
            # matching names but different widths must fail HERE, not as
            # an opaque dot-shape error inside jit)
            params = _to_params(load_file(path), clip_param_shapes(cfg),
                                "clip")
        self.params = params
        if tokenizer is None:
            from transformers import CLIPTokenizer
            tokenizer = CLIPTokenizer.from_pretrained(
                os.path.join(root, "tokenizer"))
        self.tok = tokenizer
        # params passed as an ARGUMENT: closing over them would bake
        # ~492 MB of weights into the HLO as constants (slow trace, and
        # a weight-dependent module hash that defeats the persistent
        # compile cache)
        self._apply = jax.jit(
            lambda params, ids: clip_text_apply(self.cfg, params, ids))

    def encode(self, prompt: str) -> jnp.ndarray:
        T = self.cfg.max_positions
        ids = self.tok([prompt, ""], padding="max_length", max_length=T,
                       truncation=True, return_tensors="np").input_ids
        emb = self._apply(self.params, jnp.asarray(ids, jnp.int32))
        text, uncond = emb[0:1], emb[1:2]
        return jnp.concatenate([text, uncond, uncond], axis=0)

"""Pixel-sharded rendering over a device mesh.

Design (SURVEY.md §5.7/§5.8 TPU-native counterpart): the image is sharded
into horizontal tile-row bands, one per device along the mesh axes. Only
the rasterizer core runs under ``jax.shard_map`` — each device bins and
composites its own band (the homography coefficients are pixel-linear, so
a band is just a viewport shift of A by y0·C). Everything around it —
SSIM windows that straddle band boundaries, loss reductions, and the
parameter-gradient all-reduce (the ``psum`` over ICI) — is left to
GSPMD/XLA partitioning, which inserts halo exchanges and collectives
automatically from the output sharding.

This is the 2D-rendering analog of context parallelism: "sequence length"
here is pixel count, and the VJP of the replicated-Gaussian gather is the
gradient all-reduce. Whether the Gaussian records arrive replicated or
sharded along a ``gauss`` axis (gaussian_parallel.py phase B) is decided
by the caller's sharding constraints; the shard_map boundary all-gathers
either way.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.rasterize.api import RasterizeConfig, rasterize
from ..ops.rasterize.common import TILE_H
from ..ops.rasterize.preprocess import PreprocessOut


def shift_viewport(pre: PreprocessOut, y0) -> PreprocessOut:
    """Re-target preprocessed Gaussians to a viewport starting at row y0.

    p(x, y_global) = A + x·B + y_global·C with y_global = y_local + y0
    ⇒ A' = A + y0·C; the conic center shifts by −y0. Everything else is
    viewport-independent.
    """
    y0f = jnp.asarray(y0, pre.A.dtype)
    return pre._replace(
        A=pre.A + y0f * pre.C,
        center2d=pre.center2d - jnp.stack(
            [jnp.zeros_like(y0f), y0f])[None, :],
    )


def rasterize_sharded(pre: PreprocessOut, cfg: RasterizeConfig, mesh,
                      axis=None) -> Tuple[jnp.ndarray, dict]:
    """Full-image rasterization with row-band sharding over ``mesh``.

    ``axis`` may be one axis name, a tuple of axis names, or None for ALL
    mesh axes — with a 2-D ("gauss", "data") mesh the image splits into
    gauss·data bands, so every chip rasterizes pixels even when the
    parameter axis exists only for memory sharding (see
    gaussian_parallel.py). Returns ((NUM_OUT, H, W) image sharded along H,
    aux dict).
    """
    if axis is None:
        axis = mesh.axis_names
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    assert cfg.height % (n * TILE_H) == 0, (
        f"height {cfg.height} must be a multiple of {n}*{TILE_H}")
    hb = cfg.height // n
    cfg_band = dataclasses.replace(cfg, height=hb)
    y0s = (jnp.arange(n, dtype=jnp.int32) * hb)

    def band(pre_rep, y0):
        pre_b = shift_viewport(pre_rep, y0[0])
        out, aux = rasterize(pre_b, cfg_band)
        return (out, aux["num_pairs"][None], aux["overflow"][None],
                aux["padded_total"][None], aux["num_expanded"][None],
                aux["num_rows"][None])

    out, pairs, overflow, padded, expanded, rows = jax.shard_map(
        band, mesh=mesh,
        in_specs=(P(), P(axes)),
        out_specs=(P(None, axes, None), P(axes), P(axes), P(axes), P(axes),
                   P(axes)),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(pre, y0s)
    # the per-band capacity is what must cover the demand → max, not sum
    return out, {"num_pairs": jnp.sum(pairs),
                 "overflow": jnp.any(overflow),
                 "padded_total": jnp.max(padded),
                 "num_expanded": jnp.max(expanded),
                 "num_rows": jnp.max(rows)}

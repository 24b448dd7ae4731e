"""Capacity-padded Gaussian surfel parameter state.

TPU-native re-design of the reference GaussianModel
(/root/reference/scene/gaussian_model.py:24-166): instead of torch tensors
re-allocated by densification ("optimizer surgery", :257-326), parameters
live in FIXED-capacity arrays with an ``active`` mask. Densification writes
into free slots under jit (models/densify.py); capacity growth is a rare
host-side re-pad (bucketed recompilation).

Activation contract matches :26-41: exp on the 2 log-scales, sigmoid
opacity, L2-normalized wxyz quaternion. SH features use the reference's
(N, K, 3) coefficient-major layout split into DC (K=1) and rest.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import num_sh_coeffs, rgb_to_sh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    xyz: Any            # (cap, 3)
    features_dc: Any    # (cap, 1, 3)
    features_rest: Any  # (cap, K-1, 3)
    scaling: Any        # (cap, 2) log-scale
    rotation: Any       # (cap, 4) unnormalized wxyz
    opacity: Any        # (cap, 1) logit

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    params: GaussianParams
    active: Any            # (cap,) bool
    active_sh_degree: Any  # () int32 (ramped +1 / 1000 iters)
    # densification statistics (reference :405-407)
    max_radii2d: Any       # (cap,) f32
    grad_accum: Any        # (cap,) f32  — Σ‖screen-grad‖ over iterations
    denom: Any             # (cap,) f32

    @property
    def capacity(self) -> int:
        return self.params.capacity

    def num_active(self):
        return jnp.sum(self.active.astype(jnp.int32))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def activated(params: GaussianParams):
    """Returns (xyz, scales, quats_raw, opacity, shs) in activated form.

    Quats are passed raw — preprocess normalizes (gradient flows through
    the normalization, as in the reference where rotation_activation is
    F.normalize).
    """
    scales = jnp.exp(params.scaling)
    opacity = jax.nn.sigmoid(params.opacity)[:, 0]
    shs = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    return params.xyz, scales, params.rotation, opacity, shs


def sh_table_kn(params: GaussianParams) -> jnp.ndarray:
    """SH coefficients as a LANE-MAJOR (K*3, cap) table (row k*3+c = the
    row-major flatten of the reference's (N, K, 3) layout, transposed).
    The (cap, K, 3) orientation tile-pads its 3-wide minor dim 43x on TPU
    — see ops/sh.py eval_sh_kn; this is the hot-path form the renderer
    feeds to preprocess."""
    cap = params.capacity
    dc = params.features_dc.reshape(cap, -1)        # (cap, 3)
    rest = params.features_rest.reshape(cap, -1)    # (cap, 3*(K-1))
    return jnp.concatenate([dc.T, rest.T], axis=0)  # (K*3, cap)


def sh_degree_mask(active_degree, max_degree: int):
    """(K, 1) multiplier zeroing SH coefficients above the active degree —
    the functional analog of the reference's active_sh_degree ramp
    (train.py:61-62) without a dynamic code path."""
    K = num_sh_coeffs(max_degree)
    idx = jnp.arange(K)
    deg = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (deg <= active_degree).astype(jnp.float32)[:, None]


def init_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                  max_sh_degree: int = 3,
                  init_scales: np.ndarray | None = None,
                  seed: int = 0) -> GaussianState:
    """Reference create_from_pcd contract (gaussian_model.py:124-146):
    DC features from RGB2SH, log-scale from mean sq. distance to the 3
    nearest neighbors (computed by ops.knn outside), random rotations,
    opacity logit of 0.1."""
    n = points.shape[0]
    assert capacity >= n
    K = num_sh_coeffs(max_sh_degree)
    rng = np.random.default_rng(seed)

    if init_scales is None:
        from ..native_lib import knn3_mean_sq_dist
        d2 = knn3_mean_sq_dist(points)          # native grid KNN
        if d2 is None:                          # fallback: exact jnp
            from ..ops.knn import mean_sq_dist3
            d2 = np.asarray(mean_sq_dist3(jnp.asarray(points)))
        d2 = np.maximum(d2, 1e-7)
        init_scales = np.log(np.sqrt(d2))[:, None].repeat(2, axis=1)

    def pad(x, shape_tail, fill=0.0):
        out = np.full((capacity,) + shape_tail, fill, np.float32)
        out[:n] = x
        return out

    params = GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32), (3,))),
        features_dc=jnp.asarray(
            pad(np.asarray(rgb_to_sh(colors.astype(np.float32)))[:, None, :],
                (1, 3))),
        features_rest=jnp.asarray(np.zeros((capacity, K - 1, 3), np.float32)),
        scaling=jnp.asarray(pad(init_scales.astype(np.float32), (2,))),
        rotation=jnp.asarray(
            pad(rng.random((n, 4)).astype(np.float32), (4,), fill=1.0)),
        opacity=jnp.asarray(
            pad(np.full((n, 1), float(inverse_sigmoid(0.1)), np.float32),
                (1,))),
    )
    active = jnp.asarray(np.arange(capacity) < n)
    zeros = jnp.zeros((capacity,), jnp.float32)
    return GaussianState(params=params, active=active,
                         active_sh_degree=jnp.int32(0),
                         max_radii2d=zeros, grad_accum=zeros, denom=zeros)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Re-pad to a larger capacity bucket (recompiles users). Pads ON
    DEVICE: np.asarray on a process-sharded array (multi-host gauss
    axis) raises 'spans non-addressable devices' — the ZeRO-style
    sharded configuration would crash at its first capacity doubling."""
    old = state.capacity
    assert new_capacity >= old

    def pad(x):
        x = jnp.asarray(x)
        zeros = jnp.zeros((new_capacity - old,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, zeros], axis=0)

    return GaussianState(
        params=jax.tree_util.tree_map(pad, state.params),
        active=pad(state.active),
        active_sh_degree=state.active_sh_degree,
        max_radii2d=pad(state.max_radii2d),
        grad_accum=pad(state.grad_accum),
        denom=pad(state.denom),
    )

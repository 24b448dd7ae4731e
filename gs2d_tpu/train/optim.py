"""Masked per-group Adam for capacity-padded Gaussian parameters.

Functional replacement for the reference's torch.optim.Adam with per-group
learning rates and optimizer-state surgery
(/root/reference/scene/gaussian_model.py:148-166, 257-326): moments live in
GaussianParams-shaped arrays; densification simply zeroes the moment rows
of freed/new slots — no re-allocation. eps=1e-15 (:162), betas (0.9, 0.999).
Bias correction uses a global step counter, matching torch's per-parameter
step that survives concatenation surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams

B1 = 0.9
B2 = 0.999
EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Any   # GaussianParams-shaped first moments
    nu: Any   # GaussianParams-shaped second moments
    step: Any  # () int32


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=dataclasses.replace(zeros),
                     step=jnp.int32(0))


def adam_step(params: GaussianParams, grads: GaussianParams,
              opt: AdamState, lrs: GaussianParams,
              active: jnp.ndarray):
    """One masked Adam update. ``lrs`` is a GaussianParams of scalar LRs."""
    step = opt.step + 1
    c1 = 1.0 - B1 ** step.astype(jnp.float32)
    c2 = 1.0 - B2 ** step.astype(jnp.float32)

    new_p, new_m, new_v = {}, {}, {}
    for f in dataclasses.fields(GaussianParams):
        p = getattr(params, f.name)
        g = getattr(grads, f.name)
        m = getattr(opt.mu, f.name)
        v = getattr(opt.nu, f.name)
        lr = getattr(lrs, f.name)
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m_new = B1 * m + (1 - B1) * g
        v_new = B2 * v + (1 - B2) * g * g
        p_new = p - lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + EPS)
        new_p[f.name] = jnp.where(mask, p_new, p)
        new_m[f.name] = m_new
        new_v[f.name] = v_new
    return (GaussianParams(**new_p),
            AdamState(mu=GaussianParams(**new_m),
                      nu=GaussianParams(**new_v), step=step))


def make_lrs(xyz_lr: jnp.ndarray, *,
             feature_lr: float = 0.0025, opacity_lr: float = 0.05,
             scaling_lr: float = 0.005,
             rotation_lr: float = 0.001) -> GaussianParams:
    """Per-group LRs (reference :153-160); xyz_lr is the scheduled value
    already scaled by the scene extent."""
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.float32(feature_lr),
        features_rest=jnp.float32(feature_lr / 20.0),
        scaling=jnp.float32(scaling_lr),
        rotation=jnp.float32(rotation_lr),
        opacity=jnp.float32(opacity_lr),
    )

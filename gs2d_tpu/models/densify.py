"""Adaptive densification under jit: masked clone / split / prune.

Semantics of /root/reference/scene/gaussian_model.py:348-403 re-designed
for fixed-capacity arrays (no torch optimizer surgery):

  * clone  — screen-grad ≥ threshold AND max scale ≤ percent_dense·extent:
             copy the point into a free slot (:374-387).
  * split  — screen-grad ≥ threshold AND max scale > percent_dense·extent:
             TWO children sampled from N(0, diag(s_u, s_v, 0)) rotated into
             world, scales divided by 1.6 (= 0.8·N with N=2, :348-372);
             the original is pruned.
  * prune  — opacity < min_opacity; after the first opacity reset also
             screen radius > 20 px or world scale > 0.1·extent (:389-401).

Free slots are assigned by rank-compaction (argsort of the occupancy
mask), everything stays statically shaped; children beyond capacity are
dropped (capacity growth is a host-side re-pad). New/freed slots get their
Adam moments zeroed — the functional equivalent of the reference's
exp_avg/exp_avg_sq surgery (:257-326). Deviation from the reference: the
prune criteria are evaluated on the pre-densify population only, and new
children are filtered by the opacity cull at creation instead of being
appended then immediately pruned.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.quat import normalize_quat, quat_to_rotmat
from ..train.optim import AdamState
from .gaussians import GaussianParams, GaussianState


@functools.partial(jax.jit, static_argnames=())
def densify_and_prune(state: GaussianState, opt: AdamState,
                      key: jnp.ndarray,
                      grad_threshold: jnp.ndarray,
                      min_opacity: jnp.ndarray,
                      extent: jnp.ndarray,
                      max_screen_size: jnp.ndarray,
                      percent_dense: jnp.ndarray
                      ) -> Tuple[GaussianState, AdamState]:
    cap = state.capacity
    p = state.params
    active = state.active

    grads = state.grad_accum / jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, grads, 0.0)
    scales = jnp.exp(p.scaling)
    max_scale = jnp.max(scales, axis=-1)
    opacity = jax.nn.sigmoid(p.opacity[:, 0])

    hot = active & (grads >= grad_threshold)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    # prune originals: low opacity; plus WORLD size when enabled. The
    # reference's screen-size criterion (max_radii2D > max_screen_size,
    # gaussian_model.py:397-399) is DEAD code there: densification_postfix
    # zeroes max_radii2D for all points (:344-346) before the prune ever
    # reads it — so for parity the screen-radius test must not fire here
    # either (an active version prunes large foreground splats the
    # reference keeps, changing the whole quality trajectory).
    prune = active & (opacity < min_opacity)
    size_prune = active & (max_scale > 0.1 * extent)
    prune = jnp.where(max_screen_size > 0, prune | size_prune, prune)
    prune = prune | split_mask                      # split originals die

    active_after = active & ~prune

    # --- build new-point source table -------------------------------------
    idx = jnp.arange(cap, dtype=jnp.int32)
    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    n_split = jnp.sum(split_mask.astype(jnp.int32))
    n_new = n_clone + 2 * n_split

    # ordered source indices (masked-first order via argsort on ~mask)
    clone_src = jnp.argsort(~clone_mask, stable=True).astype(jnp.int32)
    split_src = jnp.argsort(~split_mask, stable=True).astype(jnp.int32)
    del clone_rank, split_rank

    kk = idx
    is_clone = kk < n_clone
    src_c = clone_src[jnp.minimum(kk, cap - 1)]
    ks = jnp.maximum(kk - n_clone, 0)
    src_s = split_src[jnp.minimum(ks // 2, cap - 1)]
    src = jnp.where(is_clone, src_c, src_s)

    # split child perturbation: x += R @ (eps * (s_u, s_v, 0))
    eps = jax.random.normal(key, (cap, 3), jnp.float32)
    eps = eps * jnp.concatenate(
        [scales[src][:, :2], jnp.zeros((cap, 1), jnp.float32)], axis=-1)
    R = quat_to_rotmat(normalize_quat(p.rotation[src]))
    delta = jnp.einsum("nij,nj->ni", R, eps)

    new_xyz = jnp.where(is_clone[:, None], p.xyz[src], p.xyz[src] + delta)
    new_scaling = jnp.where(is_clone[:, None], p.scaling[src],
                            p.scaling[src] - jnp.log(1.6))
    new_opacity_val = jax.nn.sigmoid(p.opacity[src][:, 0])
    child_ok = new_opacity_val >= min_opacity       # creation-time cull

    # --- place into free slots --------------------------------------------
    free_order = jnp.argsort(active_after, stable=True).astype(jnp.int32)
    n_free = cap - jnp.sum(active_after.astype(jnp.int32))
    valid_new = (kk < n_new) & (kk < n_free) & child_ok
    dest = jnp.where(valid_new, free_order[jnp.minimum(kk, cap - 1)], cap)

    def scatter(leaf, new_leaf):
        return leaf.at[dest].set(
            jnp.where(valid_new.reshape((-1,) + (1,) * (new_leaf.ndim - 1)),
                      new_leaf, leaf[jnp.minimum(dest, cap - 1)]),
            mode="drop")

    new_params = GaussianParams(
        xyz=scatter(p.xyz, new_xyz),
        features_dc=scatter(p.features_dc, p.features_dc[src]),
        features_rest=scatter(p.features_rest, p.features_rest[src]),
        scaling=scatter(p.scaling, new_scaling),
        rotation=scatter(p.rotation, p.rotation[src]),
        opacity=scatter(p.opacity, p.opacity[src]),
    )

    new_active = active_after.at[dest].set(
        jnp.where(valid_new, True, active_after[jnp.minimum(dest, cap - 1)]),
        mode="drop")

    # zero Adam moments of freed + newly-filled slots
    moment_clear = (~new_active) | (new_active & ~active_after)

    def clear(leaf):
        mask = moment_clear.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, 0.0, leaf)

    new_opt = AdamState(
        mu=jax.tree_util.tree_map(clear, opt.mu),
        nu=jax.tree_util.tree_map(clear, opt.nu),
        step=opt.step,
    )

    zeros = jnp.zeros((cap,), jnp.float32)
    new_state = dataclasses.replace(
        state, params=new_params, active=new_active,
        max_radii2d=zeros, grad_accum=zeros, denom=zeros)
    return new_state, new_opt


def reset_opacity(state: GaussianState, opt: AdamState
                  ) -> Tuple[GaussianState, AdamState]:
    """Clamp opacity to ≤ 0.01 and zero its Adam moments
    (reference :209-212 + replace_tensor_to_optimizer)."""
    o = jax.nn.sigmoid(state.params.opacity)
    o = jnp.minimum(o, 0.01)
    new_logit = jnp.log(o / (1.0 - o))
    params = dataclasses.replace(state.params, opacity=new_logit)
    opt = AdamState(
        mu=dataclasses.replace(opt.mu,
                               opacity=jnp.zeros_like(opt.mu.opacity)),
        nu=dataclasses.replace(opt.nu,
                               opacity=jnp.zeros_like(opt.nu.opacity)),
        step=opt.step)
    return dataclasses.replace(state, params=params), opt


def add_densification_stats(state: GaussianState,
                            screen_grads: jnp.ndarray,
                            radii: jnp.ndarray,
                            width: int, height: int) -> GaussianState:
    """Accumulate per-point screen-gradient norms and max radii
    (reference train.py:127-128, gaussian_model.py:405-407).

    ``screen_grads`` arrive in PIXEL units (grad w.r.t. the zero screen
    offset); the reference CUDA kernel emits mean2D gradients in the NDC
    half-extent convention (pixel grad x W/2, H/2) and the 2e-4 densify
    threshold is tuned for THOSE units — without this conversion the
    threshold is ~2/W too strict and clone/split never fires (observed:
    a synthetic scene only pruned, never densified, plateauing at
    PSNR ~12).
    """
    vis = radii > 0
    scale = jnp.asarray([0.5 * width, 0.5 * height], screen_grads.dtype)
    gnorm = jnp.linalg.norm(screen_grads * scale, axis=-1)
    return dataclasses.replace(
        state,
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d,
                                               radii.astype(jnp.float32)),
                              state.max_radii2d),
        grad_accum=state.grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
    )

"""Masked Adam vs torch.optim.Adam; LR schedule; densify mechanics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.models.densify import (add_densification_stats,
                                     densify_and_prune, reset_opacity)
from gs2d_tpu.models.gaussians import (GaussianParams, GaussianState,
                                       init_from_pcd)
from gs2d_tpu.train.optim import AdamState, adam_step, init_adam, make_lrs
from gs2d_tpu.utils.general import expon_lr


def _rand_state(n=32, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    scales = np.log(rng.random((n, 2)).astype(np.float32) * 0.1 + 0.01)
    return init_from_pcd(pts, cols, cap, init_scales=scales, seed=seed)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    n = 16
    p0 = rng.normal(size=(n, 3)).astype(np.float32)
    state = _rand_state(n=n, cap=n)
    params = dataclasses.replace(state.params, xyz=jnp.asarray(p0))
    opt = init_adam(params)
    active = jnp.ones((n,), bool)

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([{"params": [tp], "lr": 0.01}], lr=0.0, eps=1e-15)

    for i in range(5):
        g = rng.normal(size=(n, 3)).astype(np.float32)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads = dataclasses.replace(grads, xyz=jnp.asarray(g))
        lrs = make_lrs(jnp.float32(0.01))
        params, opt = adam_step(params, grads, opt, lrs, active)

        tp.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(params.xyz),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_expon_lr_contract():
    # endpoints and log-linearity (reference get_expon_lr_func)
    lr0 = float(expon_lr(0, 1e-2, 1e-4, max_steps=1000))
    lr_mid = float(expon_lr(500, 1e-2, 1e-4, max_steps=1000))
    lr1 = float(expon_lr(1000, 1e-2, 1e-4, max_steps=1000))
    assert abs(lr0 - 1e-2) < 1e-6
    assert abs(lr1 - 1e-4) < 1e-8
    assert abs(lr_mid - 1e-3) < 1e-5
    # delay ramp scales down early steps
    lrd = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=100,
                         lr_delay_mult=0.01, max_steps=1000))
    assert lrd < lr0


def test_densify_clone_and_split():
    state = _rand_state(n=8, cap=32, seed=1)
    opt = init_adam(state.params)
    # mark half the points hot
    ga = np.zeros(32, np.float32)
    ga[:4] = 1.0
    state = dataclasses.replace(state,
                                grad_accum=jnp.asarray(ga),
                                denom=jnp.asarray((ga > 0).astype(np.float32)))
    n0 = int(state.num_active())
    # small extent → hot points with scale > percent_dense*extent split;
    # use a big extent so all hot points clone instead
    s2, o2 = densify_and_prune(
        state, opt, jax.random.PRNGKey(0),
        jnp.float32(0.5), jnp.float32(0.005), jnp.float32(1e6),
        jnp.float32(0), jnp.float32(0.01))
    assert int(s2.num_active()) == n0 + 4          # 4 clones
    # stats reset
    assert float(jnp.sum(s2.grad_accum)) == 0.0

    # tiny extent → hot points split into 2, originals pruned
    s3, _ = densify_and_prune(
        state, opt, jax.random.PRNGKey(0),
        jnp.float32(0.5), jnp.float32(0.005), jnp.float32(1e-6),
        jnp.float32(0), jnp.float32(0.01))
    # 4 split: -4 originals (pruned as big: scale>0.1*extent... all active
    # are "big" under the size rule only when max_screen_size>0; here
    # originals die via the split rule) +8 children
    assert int(s3.num_active()) == n0 - 4 + 8


def test_reset_opacity():
    state = _rand_state(n=8, cap=16)
    opt = init_adam(state.params)
    s2, o2 = reset_opacity(state, opt)
    op = jax.nn.sigmoid(s2.params.opacity)
    assert float(jnp.max(op)) <= 0.0101
    assert float(jnp.sum(jnp.abs(o2.mu.opacity))) == 0.0


def test_densification_stats_accumulate():
    state = _rand_state(n=4, cap=8)
    g = jnp.asarray(np.array([[3.0, 4.0]] * 8, np.float32))
    radii = jnp.asarray(np.array([1, 0, 2, 0, 0, 0, 0, 0], np.int32))
    s2 = add_densification_stats(state, g, radii, 2, 2)
    assert float(s2.grad_accum[0]) == 5.0
    assert float(s2.grad_accum[1]) == 0.0
    assert float(s2.denom[2]) == 1.0
    assert float(s2.max_radii2d[2]) == 2.0

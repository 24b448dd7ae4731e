"""Backward kernel: hand-written Pallas VJP vs jax.grad of the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.oracle import rasterize_oracle
from gs2d_tpu.ops.rasterize.preprocess import preprocess

from .utils import lookat_camera, random_cloud


def _loss_fn(cam, cfg, cot):
    def loss(means, scales, quats, opac, rgb, noise, offsets):
        pre = preprocess(means, scales, quats, opac, cam.world_view,
                         cam.full_proj, cam.campos, cam.width, cam.height,
                         colors=rgb, noise=noise, screen_offsets=offsets)
        if cfg is None:
            out = rasterize_oracle(pre, cam.width, cam.height)
        else:
            out, _ = rasterize(pre, cfg)
        return jnp.sum(out * cot)
    return loss


@pytest.mark.parametrize("seed,n,opaque", [(0, 60, None), (2, 120, 0.9)])
def test_grads_match_oracle(seed, n, opaque):
    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, noise = random_cloud(n, seed)
    if opaque is not None:
        opac = np.full_like(opac, opaque)
    args = tuple(jnp.asarray(x) for x in
                 (means, scales, quats, opac, rgb, noise)) + (
                     jnp.zeros((n, 2), jnp.float32),)

    rng = np.random.default_rng(seed + 100)
    cot = jnp.asarray(
        rng.normal(size=(15, cam.height, cam.width)).astype(np.float32))

    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 13, chunk=16, interpret=True)
    g_ref = jax.grad(_loss_fn(cam, None, cot), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(_loss_fn(cam, cfg, cot), argnums=tuple(range(7)))(*args)

    names = ["means", "scales", "quats", "opac", "rgb", "noise", "offsets"]
    for name, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        # atol covers f32 summation-order noise: the per-Gaussian pair
        # reduction (blocked segment sums) and jax.grad's scatter-add
        # accumulate in different orders, which matters for
        # cancellation-heavy segments with large partial terms
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=1e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_screen_offset_grad_nonzero():
    """The densification side channel must carry signal."""
    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, noise = random_cloud(40, 1)
    args = tuple(jnp.asarray(x) for x in
                 (means, scales, quats, opac, rgb, noise)) + (
                     jnp.zeros((40, 2), jnp.float32),)
    cot = jnp.zeros((15, cam.height, cam.width), jnp.float32).at[0:3].set(1.0)
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 13, chunk=16, interpret=True)
    g = jax.grad(_loss_fn(cam, cfg, cot), argnums=6)(*args)
    assert float(jnp.abs(g).max()) > 0.0


def test_nonfinite_entry_does_not_poison_grads():
    """A Gaussian whose homography coefficients go non-finite (binning
    deliberately keeps such pairs) must composite as zero AND contribute
    zero — not NaN — gradients: 0*NaN in the backward's geometry chain
    previously poisoned the whole parameter row via the segment sum."""
    import dataclasses

    from gs2d_tpu.ops.rasterize.preprocess import preprocess as _pre

    cam = lookat_camera(width=64, height=32)
    means, scales, quats, opac, rgb, noise = random_cloud(30, 4)
    args = tuple(jnp.asarray(x) for x in
                 (means, scales, quats, opac, rgb, noise)) + (
                     jnp.zeros((30, 2), jnp.float32),)
    cot = jnp.ones((15, cam.height, cam.width), jnp.float32)
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 12, chunk=16, interpret=True)

    def loss(means, scales, quats, opac, rgb, noise, offsets):
        pre = preprocess(means, scales, quats, opac, cam.world_view,
                         cam.full_proj, cam.campos, cam.width, cam.height,
                         colors=rgb, noise=noise, screen_offsets=offsets)
        # poison one visible Gaussian's A coefficients with inf AFTER
        # preprocess, exactly as a diverged parameter would surface
        bad = jnp.zeros((30, 3), jnp.float32).at[3].set(jnp.inf)
        pre = pre._replace(A=pre.A + jax.lax.stop_gradient(bad))
        out, _ = rasterize(pre, cfg)
        return jnp.sum(out * cot)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for gi in g:
        assert bool(jnp.isfinite(gi).all()), "NaN/Inf leaked into grads"

"""Sharded rasterization on an 8-device CPU mesh vs single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.parallel.data_parallel import rasterize_sharded, shift_viewport
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step

from .utils import lookat_camera, random_cloud


def _mesh(n=8):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, ("data",))


def _pre(cam, n=150, seed=0):
    means, scales, quats, opac, rgb, noise = random_cloud(n, seed)
    return preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
        cam.width, cam.height, colors=jnp.asarray(rgb),
        noise=jnp.asarray(noise))


def test_viewport_shift_identity():
    cam = lookat_camera(width=128, height=64)
    pre = _pre(cam)
    cfg = RasterizeConfig(width=128, height=64, pairs_capacity=1 << 12,
                          chunk=16, interpret=True)
    full, _ = rasterize(pre, cfg)
    # render lower half via viewport shift
    cfg_h = dataclasses.replace(cfg, height=32)
    half, _ = rasterize(shift_viewport(pre, 32), cfg_h)
    np.testing.assert_allclose(np.asarray(full[:, 32:, :]),
                               np.asarray(half), rtol=1e-4, atol=1e-5)


def test_sharded_matches_single():
    # 8 devices x TILE_H(16) rows => height 128 is the minimum shardable
    mesh = _mesh()
    cam = lookat_camera(width=128, height=128)
    pre = _pre(cam)
    cfg = RasterizeConfig(width=128, height=128, pairs_capacity=1 << 13,
                          chunk=16, interpret=True)
    single, _ = rasterize(pre, cfg)
    sharded, aux = jax.jit(
        lambda p: rasterize_sharded(p, cfg, mesh))(pre)
    s, f = np.asarray(sharded), np.asarray(single)
    nonmed = [c for c in range(s.shape[0]) if c != 8]
    # the band viewport shift folds y0·C into A, changing f32 rounding of
    # every per-pixel homography evaluation — tolerance covers that
    np.testing.assert_allclose(s[nonmed], f[nonmed], rtol=1e-3, atol=1e-4)
    # median depth is a discrete selection at the T=0.5 boundary — the
    # band viewport shift changes f32 rounding, so isolated flips are
    # expected (same contract as the hardware-vs-oracle check)
    assert (np.abs(s[8] - f[8]) > 1e-4).mean() < 1e-4


def test_dp_train_step_matches_single():
    mesh = _mesh()
    cam = lookat_camera(width=128, height=128)
    means, scales, quats, opac, rgb, _ = random_cloud(
        40, 3, spread=0.8, scale_lo=0.1, scale_hi=0.3)
    state = init_from_pcd(means, rgb, 64, init_scales=np.log(scales))
    gt = jnp.asarray(
        np.random.default_rng(0).random((3, 128, 128)).astype(np.float32))
    bg = jnp.zeros((3,), jnp.float32)
    cfg = RasterizeConfig(width=128, height=128, pairs_capacity=1 << 13,
                          chunk=16, interpret=True)
    opt_cfg = OptimizationParams()

    step_1 = make_train_step(cfg, opt_cfg)
    step_n = make_train_step(cfg, opt_cfg, mesh=mesh)
    ts0 = TrainState(gaussians=state, opt=init_adam(state.params),
                     key=jax.random.PRNGKey(0))
    ts1, m1 = step_1(ts0, cam, gt, jnp.int32(4000), bg)
    tsn, mn = step_n(ts0, cam, gt, jnp.int32(4000), bg)

    assert abs(float(m1["total_loss"]) - float(mn["total_loss"])) < 1e-4
    np.testing.assert_allclose(
        np.asarray(tsn.gaussians.params.xyz),
        np.asarray(ts1.gaussians.params.xyz), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tsn.gaussians.grad_accum),
        np.asarray(ts1.gaussians.grad_accum), rtol=1e-3, atol=1e-6)


def test_gauss_sharded_train_step_matches_single():
    """Phase B: 2-D (gauss=2, data=4) mesh — params/Adam/densify stats
    sharded along the Gaussian axis, image banded over ALL 8 devices —
    must reproduce the single-device step."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("gauss", "data"))
    cam = lookat_camera(width=128, height=128)
    means, scales, quats, opac, rgb, _ = random_cloud(
        40, 3, spread=0.8, scale_lo=0.1, scale_hi=0.3)
    state = init_from_pcd(means, rgb, 64, init_scales=np.log(scales))
    gt = jnp.asarray(
        np.random.default_rng(0).random((3, 128, 128)).astype(np.float32))
    bg = jnp.zeros((3,), jnp.float32)
    cfg = RasterizeConfig(width=128, height=128, pairs_capacity=1 << 13,
                          chunk=16, interpret=True)
    opt_cfg = OptimizationParams()

    step_1 = make_train_step(cfg, opt_cfg)
    step_g = make_train_step(cfg, opt_cfg, mesh=mesh)
    ts0 = TrainState(gaussians=state, opt=init_adam(state.params),
                     key=jax.random.PRNGKey(0))
    ts1, m1 = step_1(ts0, cam, gt, jnp.int32(4000), bg)
    tsg, mg = step_g(ts0, cam, gt, jnp.int32(4000), bg)

    assert abs(float(m1["total_loss"]) - float(mg["total_loss"])) < 1e-4
    np.testing.assert_allclose(
        np.asarray(tsg.gaussians.params.xyz),
        np.asarray(ts1.gaussians.params.xyz), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tsg.opt.mu.xyz),
        np.asarray(ts1.opt.mu.xyz), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tsg.gaussians.grad_accum),
        np.asarray(ts1.gaussians.grad_accum), rtol=1e-3, atol=1e-6)
    # the update really ran sharded: params land split along "gauss"
    sh = tsg.gaussians.params.xyz.sharding
    assert getattr(sh, "spec", None) is not None and sh.spec[0] == "gauss"

"""Capacity growth must not change rendering or training behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.models.gaussians import grow_capacity, init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.render.renderer import render

from .utils import lookat_camera, random_cloud


def test_grow_capacity_render_invariant():
    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, _ = random_cloud(
        40, 0, spread=0.8, scale_lo=0.1, scale_hi=0.3)
    state = init_from_pcd(means, rgb, 64, init_scales=np.log(scales))
    cfg = RasterizeConfig(width=128, height=64, pairs_capacity=1 << 12,
                          chunk=16, interpret=True)
    bg = jnp.zeros((3,), jnp.float32)
    a = render(cam, state, cfg, bg)["render"]
    grown = grow_capacity(state, 256)
    assert grown.capacity == 256
    assert int(grown.num_active()) == int(state.num_active())
    b = render(cam, grown, cfg, bg)["render"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_overflow_step_is_noop_on_device():
    """When binning overflows (pairs dropped, truncated gradients), the
    jitted step must leave params, Adam moments, and densify stats
    untouched ON DEVICE — the host only notices on its polling cadence
    and regrows capacity, so corrupt updates must never land."""
    import jax
    import jax.numpy as jnp

    from gs2d_tpu.config import OptimizationParams
    from gs2d_tpu.ops.rasterize.api import RasterizeConfig
    from gs2d_tpu.train.optim import init_adam
    from gs2d_tpu.train.step import TrainState, make_train_step
    from .utils import lookat_camera, random_cloud

    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, _ = random_cloud(
        120, 0, spread=0.5, scale_lo=0.1, scale_hi=0.4)
    state = init_from_pcd(means, rgb, 128, init_scales=np.log(scales))
    gt = jnp.zeros((3, 64, 128), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    opt_cfg = OptimizationParams()

    # tiny capacity: 120 clustered splats across a 128x64 image need far
    # more than 64 slots -> guaranteed overflow
    cfg_tiny = RasterizeConfig(width=128, height=64, pairs_capacity=128,
                               chunk=16, interpret=True)
    step = make_train_step(cfg_tiny, opt_cfg)
    ts0 = TrainState(gaussians=state, opt=init_adam(state.params),
                     key=jax.random.PRNGKey(0))
    ts1, m = step(ts0, cam, gt, jnp.int32(100), bg)
    assert bool(m["overflow"])
    np.testing.assert_array_equal(np.asarray(ts1.gaussians.params.xyz),
                                  np.asarray(ts0.gaussians.params.xyz))
    np.testing.assert_array_equal(np.asarray(ts1.opt.mu.xyz),
                                  np.asarray(ts0.opt.mu.xyz))
    assert int(ts1.opt.step) == int(ts0.opt.step)
    np.testing.assert_array_equal(np.asarray(ts1.gaussians.grad_accum),
                                  np.asarray(ts0.gaussians.grad_accum))
    np.testing.assert_array_equal(np.asarray(ts1.gaussians.denom),
                                  np.asarray(ts0.gaussians.denom))

    # and at sufficient capacity the same step DOES update
    cfg_big = RasterizeConfig(width=128, height=64, pairs_capacity=1 << 13,
                              chunk=16, interpret=True)
    step2 = make_train_step(cfg_big, opt_cfg)
    ts2, m2 = step2(ts0, cam, gt, jnp.int32(100), bg)
    assert not bool(m2["overflow"])
    assert not np.array_equal(np.asarray(ts2.gaussians.params.xyz),
                              np.asarray(ts0.gaussians.params.xyz))

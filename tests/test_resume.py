"""Checkpoint/resume continuity: saving and restoring mid-training must
reproduce the exact same trajectory as uninterrupted training."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.models.io import load_checkpoint, save_checkpoint
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step

from .utils import lookat_camera, random_cloud


def test_checkpoint_resume_bitexact(tmp_path):
    cam = lookat_camera(width=64, height=32)
    rcfg = RasterizeConfig(width=64, height=32, pairs_capacity=1 << 11,
                           chunk=16, interpret=True)
    means, scales, quats, opac, rgb, _ = random_cloud(
        20, 0, spread=0.8, scale_lo=0.1, scale_hi=0.3)
    state = init_from_pcd(means, rgb, 32, init_scales=np.log(scales))
    gt = jnp.asarray(
        np.random.default_rng(1).random((3, 32, 64)).astype(np.float32))
    bg = jnp.zeros((3,), jnp.float32)
    step = make_train_step(rcfg, OptimizationParams())

    ts = TrainState(gaussians=state, opt=init_adam(state.params),
                    key=jax.random.PRNGKey(0))
    # run 6 steps straight
    ts_a = ts
    for i in range(1, 7):
        ts_a, _ = step(ts_a, cam, gt, jnp.int32(i), bg)

    # run 3, checkpoint, reload, run 3 more
    ts_b = ts
    for i in range(1, 4):
        ts_b, _ = step(ts_b, cam, gt, jnp.int32(i), bg)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, ts_b.gaussians, ts_b.opt, 3, 1.0)
    gs2, opt2, it, _ = load_checkpoint(p)
    assert it == 3
    ts_c = TrainState(gaussians=gs2, opt=opt2, key=jax.random.PRNGKey(0))
    for i in range(4, 7):
        ts_c, _ = step(ts_c, cam, gt, jnp.int32(i), bg)

    np.testing.assert_array_equal(np.asarray(ts_a.gaussians.params.xyz),
                                  np.asarray(ts_c.gaussians.params.xyz))
    np.testing.assert_array_equal(np.asarray(ts_a.opt.mu.scaling),
                                  np.asarray(ts_c.opt.mu.scaling))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax pytree checkpoint: bit-exact roundtrip, including params
    sharded along a gauss mesh axis (the pod-checkpoint path)."""
    import numpy as np
    import jax
    import pytest
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from gs2d_tpu.models.gaussians import init_from_pcd
    from gs2d_tpu.models.io import (load_checkpoint_orbax,
                                    save_checkpoint_orbax)
    from gs2d_tpu.train.optim import init_adam

    rng = np.random.default_rng(0)
    state = init_from_pcd(rng.random((40, 3)).astype(np.float32),
                          rng.random((40, 3)).astype(np.float32), 64)
    # shard the capacity axis over 8 devices before saving
    mesh = Mesh(np.array(jax.devices()[:8]), ("gauss",))
    sh = NamedSharding(mesh, P("gauss"))
    state = dataclasses.replace(
        state, params=jax.tree.map(lambda x: jax.device_put(x, sh),
                                   state.params))
    opt = init_adam(state.params)
    path = os.path.join(tmp_path, "orbax_ckpt")
    save_checkpoint_orbax(path, state, opt, iteration=123,
                          spatial_lr_scale=2.5)
    st2, opt2, it2, slr2 = load_checkpoint_orbax(path)
    assert it2 == 123 and slr2 == 2.5
    # overwrite at the same path must not raise (resume re-crossing a save)
    save_checkpoint_orbax(path, state, opt, iteration=124,
                          spatial_lr_scale=2.5)
    # sharded restore: leaves land with the requested sharding
    st3, opt3, it3, _ = load_checkpoint_orbax(path, capacity_sharding=sh)
    assert it3 == 124
    np.testing.assert_array_equal(np.asarray(st3.params.xyz),
                                  np.asarray(state.params.xyz))
    assert st3.params.xyz.sharding == sh
    np.testing.assert_array_equal(np.asarray(st2.params.xyz),
                                  np.asarray(state.params.xyz))
    np.testing.assert_array_equal(np.asarray(st2.active),
                                  np.asarray(state.active))
    np.testing.assert_array_equal(np.asarray(opt2.mu.scaling),
                                  np.asarray(opt.mu.scaling))
    assert int(opt2.step) == int(opt.step)

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

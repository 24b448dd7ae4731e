"""Golden-file regression test: the rasterizer's output for a fixed tiny
scene must stay stable across refactors (both oracle and Pallas paths)."""

import os

import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.oracle import rasterize_oracle
from gs2d_tpu.ops.rasterize.preprocess import preprocess

from .utils import lookat_camera, random_cloud

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "render_128x64_seed42.npz")


def _pre():
    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, noise = random_cloud(100, 42)
    return cam, preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
        cam.width, cam.height, colors=jnp.asarray(rgb),
        noise=jnp.asarray(noise))


def test_golden_oracle():
    cam, pre = _pre()
    out = np.asarray(rasterize_oracle(pre, cam.width, cam.height))
    gold = np.load(GOLDEN)["out"]
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


def test_golden_pallas():
    cam, pre = _pre()
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 12, chunk=16, interpret=True)
    out, _ = rasterize(pre, cfg)
    gold = np.load(GOLDEN)["out"]
    np.testing.assert_allclose(np.asarray(out), gold, rtol=5e-4, atol=5e-4)

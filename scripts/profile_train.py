"""End-to-end train-step timing on the current backend.

Builds a synthetic scene at a given resolution / Gaussian count and times
the full jitted training step (render -> losses -> backward -> Adam ->
densify stats) with chained data-dependent iterations.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import OptimizationParams
from gs2d_tpu.models.gaussians import init_from_pcd
from gs2d_tpu.ops.rasterize.api import RasterizeConfig
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.train.optim import init_adam
from gs2d_tpu.train.step import TrainState, make_train_step
from gs2d_tpu.utils.timing import timed_loop


def run(W, H, N, cap, capacity, label):
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    rng = np.random.default_rng(0)
    means = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    rgb = rng.random((N, 3)).astype(np.float32)
    state = init_from_pcd(means, rgb, capacity)
    rcfg = RasterizeConfig(width=W, height=H, pairs_capacity=cap, chunk=128)
    step = make_train_step(rcfg, OptimizationParams())
    ts = TrainState(gaussians=state, opt=init_adam(state.params),
                    key=jax.random.PRNGKey(0))
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    it = jnp.int32(8000)   # all losses active

    def one(ts):
        ts, metrics = step(ts, cam, gt, it, bg)
        return ts

    t, _ = timed_loop(one, ts, n=10)
    print(f"[{label}] N={N} {W}x{H} cap={cap}: {t*1e3:.2f} ms/iter "
          f"({1.0/t:.1f} it/s, {W*H/t:.3e} rays/s)")


if __name__ == "__main__":
    print("backend:", jax.devices())
    run(800, 800, 100_000, 1 << 19, 1 << 17, "lego-ish")
    run(1600, 1080, 200_000, 1 << 20, 1 << 18, "m360-ish")

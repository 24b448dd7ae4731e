"""Stage-by-stage timing of the render/train pipeline on the current
backend: preprocess | binning | forward | forward+backward | train step."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def run(W, H, N, pairs_cap, label):
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy,
                      W, H)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.03, (N, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)).astype(np.float32))
    rgb = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    cfg = RasterizeConfig(width=W, height=H, pairs_capacity=pairs_cap,
                          chunk=128)

    def pre_raw(m, s, q, o, c):
        return preprocess(m, s, q, o, cam.world_view, cam.full_proj,
                          cam.campos, W, H, colors=c)

    def fwd_raw(m, s, q, o, c):
        return rasterize(pre_raw(m, s, q, o, c), cfg)[0]

    pre_fn = jax.jit(pre_raw)
    t_pre = timeit(pre_fn, means, scales, quats, opac, rgb)
    pre = pre_fn(means, scales, quats, opac, rgb)

    bin_fn = jax.jit(lambda p: bin_gaussians(
        p.center2d, p.extent, p.depth, p.visible, W, H, pairs_cap, 128))
    t_bin = timeit(bin_fn, pre)
    bins = bin_fn(pre)
    npairs = int(bins.num_pairs)

    fwd_fn = jax.jit(fwd_raw)
    t_fwd = timeit(fwd_fn, means, scales, quats, opac, rgb)

    cot = jnp.ones((15, H, W), jnp.float32)
    grad_fn = jax.jit(jax.grad(
        lambda m, s, q, o, c: jnp.sum(fwd_raw(m, s, q, o, c) * cot),
        argnums=(0, 1, 2, 3, 4)))
    t_bwd = timeit(grad_fn, means, scales, quats, opac, rgb)

    rays = W * H
    print(f"[{label}] N={N} pairs={npairs} | pre {t_pre:.2f}ms "
          f"bin {t_bin:.2f}ms fwd {t_fwd:.2f}ms fwd+bwd {t_bwd:.2f}ms | "
          f"rays/s fwd+bwd = {rays / (t_bwd / 1e3):.3e}")


if __name__ == "__main__":
    print("backend:", jax.devices())
    run(512, 256, 20_000, 1 << 17, "small")
    run(1920, 1080, 100_000, 1 << 21, "1080p")
    run(1920, 1080, 500_000, 1 << 22, "1080p-large")

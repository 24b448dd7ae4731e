"""Benchmark: rasterizer forward+backward rays/s per chip at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no throughput baseline (BASELINE.md) —
vs_baseline is reported against the first recorded value of this bench
when available via BENCH_BASELINE env, else null.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, rasterize,
                                        suggest_pairs_capacity)
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera


def build_scene(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.004, 0.02, (n, 2)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    rgb = rng.random((n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, scales, quats, opac, rgb))


def main():
    W, H = 1920, 1080
    import math
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = build_scene()
    # auto-tune the slot capacity: one probe binning → tight allocation
    # (every capacity-proportional binning/gather/backward cost shrinks)
    probe = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H))(
        means, scales, quats, opac)
    cap = suggest_pairs_capacity(probe, W, H)
    cfg = RasterizeConfig(width=W, height=H, pairs_capacity=cap, chunk=128)
    cot = jnp.ones((15, H, W), jnp.float32)

    def loss(means, scales, quats, opac, rgb):
        pre = preprocess(means, scales, quats, opac, cam.world_view,
                         cam.full_proj, cam.campos, W, H, colors=rgb)
        out, _ = rasterize(pre, cfg)
        return jnp.sum(out * cot)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    # Chain iterations through a tiny param update so each step depends on
    # the previous one — on async backends (axon tunnel) block_until_ready
    # does not actually block, so timing must flow through data dependence
    # (gs2d_tpu.utils.timing).
    def step(args):
        g = grad(*args)
        return tuple(a - 1e-12 * gi for a, gi in zip(args, g))

    from gs2d_tpu.utils.timing import timed_loop
    dt, _ = timed_loop(step, (means, scales, quats, opac, rgb), n=10)
    rays_per_s = W * H / dt

    base = os.environ.get("BENCH_BASELINE")
    vs = rays_per_s / float(base) if base else None
    print(json.dumps({
        "metric": "rays_per_s_per_chip_fwd_bwd_1080p",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()

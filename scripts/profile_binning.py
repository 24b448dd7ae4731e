"""Time bin_gaussians alone at trained-like 1M/1080p on the current
backend (chained iterations). Fast feedback for binning changes.

Usage: python scripts/profile_binning.py [N]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import suggest_capacities
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
CHUNK = 128
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    print("backend:", jax.devices(), flush=True)
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(N))
    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H,
        colors=c))(means, scales, quats, opac, rgb)
    cap, fin_cap, rows_cap = suggest_capacities(pre, W, H, chunk=CHUNK)
    print(f"cap {cap} fin {fin_cap} rows {rows_cap}", flush=True)
    bin_fn = jax.jit(lambda c2: bin_gaussians(
        c2, pre.extent, pre.depth, pre.visible, W, H, cap, CHUNK,
        cull_abc=(pre.A, pre.B, pre.C), rho2max=pre.rho2max,
        final_capacity=fin_cap, rows_capacity=rows_cap))

    def step(c2):
        b = bin_fn(c2)
        fb = (jnp.sum(b.gid[::997]) + jnp.sum(b.inv[::1009]) +
              jnp.sum(b.tile_start) + jnp.sum(b.seg_start[::499]))
        return c2 + 1e-30 * fb.astype(jnp.float32)

    dt, _ = timed_loop(jax.jit(step), pre.center2d, n=10)
    print(f"binning {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

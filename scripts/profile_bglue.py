"""Decompose the backward-glue stage on hardware, piece by piece.

The glue takes the bwd kernel's blocked per-slot gradient rows
(P/chunk, 22, chunk) to per-Gaussian gradient rows (N, 24):

  unblock transpose -> inv row-gather (slot -> expansion order) ->
  ok-mask -> blocked triangular-matmul segment sum -> widen 22->24 ->
  order-restore scatter

Each step is timed cumulatively (chained iterations, outputs consumed)
so the deltas attribute cost per piece. Usage:
    python scripts/profile_bglue.py [N]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, _segment_sum_rows,
                                        pack_entries, suggest_capacities)
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.common import DENTRY_F, ENTRY_F
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
CHUNK = 128
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    print("backend:", jax.devices(), flush=True)
    means, scales, quats, opac, rgb = make_trained_like_scene(N)
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H,
        colors=c))(jnp.asarray(means), jnp.asarray(scales),
                   jnp.asarray(quats), jnp.asarray(opac), jnp.asarray(rgb))
    cap, fin_cap, rows_cap = suggest_capacities(pre, W, H, chunk=CHUNK)
    bins = jax.jit(lambda c2, ex, dp, vis: bin_gaussians(
        c2, ex, dp, vis, W, H, cap, CHUNK, cull_abc=(pre.A, pre.B, pre.C),
        rho2max=pre.rho2max, final_capacity=fin_cap,
        rows_capacity=rows_cap))(pre.center2d, pre.extent, pre.depth,
                                 pre.visible)
    P = int(fin_cap)
    print(f"P={P} pairs={int(bins.num_pairs)}", flush=True)
    rng = np.random.default_rng(0)
    d_blk = jnp.asarray(rng.normal(
        size=(P // CHUNK, DENTRY_F, CHUNK)).astype(np.float32))
    inv, seg_s, seg_e, order = (bins.inv, bins.seg_start, bins.seg_end,
                                bins.order)
    Ng = order.shape[0]

    def upto(stage):
        def fn(d):
            out = d.transpose(0, 2, 1).reshape(-1, DENTRY_F)   # unblock
            if stage >= 1:
                ok = inv < P
                out = out[jnp.where(ok, inv, 0)]               # row gather
                if stage >= 2:
                    out = jnp.where(ok[:, None], out, 0.0)     # mask
                if stage >= 3:
                    out = _segment_sum_rows(out, seg_s, seg_e)  # (N, 22)
                if stage >= 4:
                    z2 = jnp.zeros((Ng, 2), out.dtype)
                    out = jnp.concatenate(
                        [out[:, :12], z2, out[:, 12:]], axis=1)  # widen
            return d + 1e-30 * jnp.sum(out[::1013])
        return jax.jit(fn)

    names = ["unblock", "+gather", "+mask", "+segsum", "+widen"]
    prev = 0.0
    for st, name in enumerate(names):
        dt, _ = timed_loop(upto(st), d_blk, n=8)
        print(f"{name:>16}: cum {dt*1e3:8.2f} ms   delta "
              f"{(dt - prev)*1e3:8.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

"""Root-cause the t_bwd_kernel_ms stage-bench artifact (VERDICT r4 #5).

bench_scale.py's bwd stage read ~198 ms while diag_bwd_regression.py
read 50.8 ms with byte-identical step code and inputs. The two harnesses
differ only in PROCESS STATE at measurement time: bench_scale has run the
gather/fwd stages first and holds their arrays live (packed, wire,
chained buffers). This script measures the SAME step function at three
points in one process:

  1. fresh      — right after building entries (diag conditions);
  2. loaded     — after allocating the same extra live arrays the stage
                  bench holds (packed + a chained gather output + d_raw);
  3. post-free  — after dropping those references again.

If (2) >> (1) ≈ (3), the artifact is HBM pressure (allocator fragmentation
/ buffer-donation failure), not kernel regression — the fix is to free
stage temporaries in the bench before the bwd point.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import pack_entries, suggest_capacities
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.common import DENTRY_F
from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
CHUNK = 128
N = int(os.environ.get("DIAG_N", "1000000"))


def time_bwd(entries, ts, tc, out_tiles, g_tiles, med_tiles, tag):
    @jax.jit
    def step_bwd(e):
        d = rasterize_bwd_pallas(e, ts, tc, out_tiles, g_tiles, med_tiles,
                                 width=W, height=H, chunk=CHUNK)
        return e + 1e-30 * jnp.sum(d[::7])
    dt, _ = timed_loop(step_bwd, entries, n=8)
    print(f"bwd[{tag}]: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(N))
    pre = jax.jit(lambda m, s, q, o, c: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H,
        colors=c))(means, scales, quats, opac, rgb)
    cap, fin_cap, rows_cap = suggest_capacities(pre, W, H, chunk=CHUNK)
    bins = jax.jit(lambda c2, ex, dp, vis: bin_gaussians(
        c2, ex, dp, vis, W, H, cap, CHUNK, cull_abc=(pre.A, pre.B, pre.C),
        rho2max=pre.rho2max, final_capacity=fin_cap,
        rows_capacity=rows_cap))(pre.center2d, pre.extent, pre.depth,
                                 pre.visible)
    packed = jax.jit(pack_entries)(pre)
    gid = bins.gid
    entries = jax.jit(
        lambda p: p[gid].reshape(-1, CHUNK, p.shape[1]).transpose(0, 2, 1)
    )(packed)
    ts, tc = bins.tile_start, bins.tile_count
    out_tiles, med_tiles = jax.jit(
        lambda e: rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                       chunk=CHUNK))(entries)
    g_tiles = jnp.ones_like(out_tiles)
    P_slots = entries.shape[0] * CHUNK

    # --- 1. fresh (diag conditions)
    time_bwd(entries, ts, tc, out_tiles, g_tiles, med_tiles, "fresh")

    # --- 2. loaded: allocate what the stage bench holds live at its bwd
    # point — a second gather output (the chained step_gather buffer) and
    # the glue's d_raw (both ~0.5 GB at this load)
    extra1 = jax.jit(lambda p: p[gid] + 1.0)(packed)
    extra2 = jnp.ones((P_slots, DENTRY_F), jnp.float32)
    jax.block_until_ready((extra1, extra2))
    time_bwd(entries, ts, tc, out_tiles, g_tiles, med_tiles, "loaded")

    # --- 3. post-free
    del extra1, extra2
    import gc
    gc.collect()
    time_bwd(entries, ts, tc, out_tiles, g_tiles, med_tiles, "post-free")

    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        print("peak HBM GB:",
              round(ms.get("peak_bytes_in_use", 0) / 2**30, 2), flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()

"""Bisect the bwd stage-bench artifact (VERDICT r4 #5) by process mode.

Two standalone processes measure the SAME rasterize_bwd_pallas on the
SAME inputs at 4x different speed: scripts/diag_bwd_regression.py reads
~51 ms where scripts/diag_bwd_artifact.py (and bench_scale.py's stage
loop) read ~198 ms. Their setups differ in small ways; this script runs
ONE variant per process (MODE env) so the variants cannot contaminate
each other:

  artifact  exact replica of diag_bwd_artifact's "fresh" point
  fwd8      + an 8-iteration timed fwd loop first (regression sequence)
  arggid    entries built by passing gid as a jit ARGUMENT after a
            numpy round-trip (regression's construction) instead of a
            closure-captured device constant
  argouts   out/g/med tiles passed as jit arguments instead of closures
  delrefs   drop bins/pre/packed references (keep ts/tc) + gc before
            timing

Usage: MODE=artifact python scripts/diag_bwd_bisect.py
"""

import gc
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import pack_entries, suggest_capacities
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
CHUNK = 128
N = int(os.environ.get("DIAG_N", "1000000"))
MODE = os.environ.get("MODE", "artifact")


def main():
    print("mode:", MODE, "devices:", jax.devices(), flush=True)
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
    if MODE == "arggid":
        gid_dev = jnp.asarray(np.asarray(gid))
        entries = jax.jit(
            lambda p, g: p[g].reshape(-1, CHUNK, p.shape[1]).transpose(0, 2, 1)
        )(packed, gid_dev)
    else:
        entries = jax.jit(
            lambda p: p[gid].reshape(-1, CHUNK, p.shape[1]).transpose(0, 2, 1)
        )(packed)
    ts, tc = bins.tile_start, bins.tile_count
    out_tiles, med_tiles = jax.jit(
        lambda e: rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                       chunk=CHUNK))(entries)
    g_tiles = jnp.ones_like(out_tiles)

    if MODE == "fwd8":
        @jax.jit
        def step_fwd(e):
            out, _ = rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                          chunk=CHUNK)
            return e + 1e-30 * jnp.sum(out[::997, :, ::97])
        dt_f, _ = timed_loop(step_fwd, entries, n=8)
        print(f"fwd loop: {dt_f*1e3:.1f} ms", flush=True)

    if MODE == "delrefs":
        del bins, pre, packed, gid
        gc.collect()

    if MODE == "argouts":
        @jax.jit
        def step_bwd(e, o, g, m):
            d = rasterize_bwd_pallas(e, ts, tc, o, g, m,
                                     width=W, height=H, chunk=CHUNK)
            return e + 1e-30 * jnp.sum(d[::7])
        dt, _ = timed_loop(
            lambda e: step_bwd(e, out_tiles, g_tiles, med_tiles),
            entries, n=8)
    else:
        @jax.jit
        def step_bwd(e):
            d = rasterize_bwd_pallas(e, ts, tc, out_tiles, g_tiles,
                                     med_tiles, width=W, height=H,
                                     chunk=CHUNK)
            return e + 1e-30 * jnp.sum(d[::7])
        dt, _ = timed_loop(step_bwd, entries, n=8)
    print(f"bwd[{MODE}]: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

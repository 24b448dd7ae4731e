"""Diagnose the backward-kernel slowdown (34 ms → 197 ms at ~5M slots).

Hypothesis: the row-interval binning keeps ~12% pairs the old exact
per-pair cull dropped, concentrated in tiles whose pixels never saturate
(background) — exactly the tiles that cannot take the all-pixels-done
early exit, so every extra chunk there costs full compute.

Measures, at N=1M trained-like 1080p:
  A. fwd/bwd kernel time on the production interval binning (baseline);
  B. same after applying the exact per-pair contribution cull post-hoc
     (numpy rebuild of the per-tile lists) — isolates pair content;
  C. per-tile chunk histograms before/after for the never-done tiles.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, pack_entries, \
    suggest_capacities
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.common import FILTER_INV_SQUARE, TILE_H, TILE_W, cdiv
from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
CHUNK = 128
N = int(os.environ.get("DIAG_N", "1000000"))


def exact_keep_np(pre, gid, tile, ntx):
    """Numpy port of binning._pair_contributes over final slots."""
    A = np.asarray(pre.A); B = np.asarray(pre.B); C = np.asarray(pre.C)
    c2d = np.asarray(pre.center2d); r2m_all = np.asarray(pre.rho2max)
    g = gid
    a0, a1, a2 = A[g, 0], A[g, 1], A[g, 2]
    b0, b1, b2 = B[g, 0], B[g, 1], B[g, 2]
    c0, c1, c2 = C[g, 0], C[g, 1], C[g, 2]
    cx, cy = c2d[g, 0], c2d[g, 1]
    r2m = np.broadcast_to(np.float32(r2m_all), g.shape) if np.ndim(r2m_all) == 0 \
        else r2m_all[g]
    tx = tile % ntx
    ty = tile // ntx
    x0 = (tx * TILE_W).astype(np.float32)
    x1 = np.minimum(x0 + (TILE_W - 1), W - 1.0)
    y0 = (ty * TILE_H).astype(np.float32)
    y1 = np.minimum(y0 + (TILE_H - 1), H - 1.0)

    def Q(x, y):
        p0 = a0 + b0 * x + c0 * y
        p1 = a1 + b1 * x + c1 * y
        p2 = a2 + b2 * x + c2 * y
        return p0 * p0 + p1 * p1 - r2m * p2 * p2

    qxx = b0 * b0 + b1 * b1 - r2m * b2 * b2
    qyy = c0 * c0 + c1 * c1 - r2m * c2 * c2
    qxy = b0 * c0 + b1 * c1 - r2m * b2 * c2
    qx = a0 * b0 + a1 * b1 - r2m * a2 * b2
    qy = a0 * c0 + a1 * c1 - r2m * a2 * c2
    inf = np.float32(np.inf)
    m = np.minimum(np.minimum(Q(x0, y0), Q(x0, y1)),
                   np.minimum(Q(x1, y0), Q(x1, y1)))
    safe_yy = np.where(qyy > 0, qyy, 1.0)
    for xe in (x0, x1):
        yv = np.clip(-(qxy * xe + qy) / safe_yy, y0, y1)
        m = np.minimum(m, np.where(qyy > 0, Q(xe, yv), inf))
    safe_xx = np.where(qxx > 0, qxx, 1.0)
    for ye in (y0, y1):
        xv = np.clip(-(qxy * ye + qx) / safe_xx, x0, x1)
        m = np.minimum(m, np.where(qxx > 0, Q(xv, ye), inf))
    m = np.minimum(m, Q(np.clip(cx, x0, x1), np.clip(cy, y0, y1)))
    det = qxx * qyy - qxy * qxy
    spd = (qxx > 0) & (det > 0)
    safe_det = np.where(spd, det, 1.0)
    xi = (qxy * qy - qyy * qx) / safe_det
    yi = (qxy * qx - qxx * qy) / safe_det
    inside = (xi >= x0) & (xi <= x1) & (yi >= y0) & (yi <= y1)
    m = np.minimum(m, np.where(spd & inside, Q(xi, yi), inf))
    keep3d = m <= 0.0
    dx = np.clip(cx, x0, x1) - cx
    dy = np.clip(cy, y0, y1) - cy
    keep2d = FILTER_INV_SQUARE * (dx * dx + dy * dy) <= r2m
    bad = ~np.isfinite(a0 + a1 + a2 + b0 + b1 + b2 + c0 + c1 + c2)
    return keep3d | keep2d | bad


def time_kernels(entries, ts, tc, tag):
    @jax.jit
    def step_fwd(e):
        out, _ = rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                      chunk=CHUNK)
        return e + 1e-30 * jnp.sum(out[::997, :, ::97])
    dt_f, _ = timed_loop(step_fwd, entries, n=8)
    out_tiles, med_tiles = jax.jit(
        lambda e: rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                       chunk=CHUNK))(entries)
    g_tiles = jnp.ones_like(out_tiles)

    @jax.jit
    def step_bwd(e):
        d = rasterize_bwd_pallas(e, ts, tc, out_tiles, g_tiles, med_tiles,
                                 width=W, height=H, chunk=CHUNK)
        return e + 1e-30 * jnp.sum(d[::7])
    dt_b, _ = timed_loop(step_bwd, entries, n=8)
    print(f"[{tag}] fwd {dt_f*1e3:.1f} ms  bwd {dt_b*1e3:.1f} ms", flush=True)
    return np.asarray(out_tiles)


def main():
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
        c2, ex, dp, vis, W, H, cap, CHUNK,
        cull_abc=(pre.A, pre.B, pre.C), rho2max=pre.rho2max,
        final_capacity=fin_cap, rows_capacity=rows_cap))(
            pre.center2d, pre.extent, pre.depth,
                                 pre.visible)
    ntx = cdiv(W, TILE_W)
    nty = cdiv(H, TILE_H)
    T = ntx * nty
    ts0 = np.asarray(bins.tile_start)
    tc0 = np.asarray(bins.tile_count)
    gid0 = np.asarray(bins.gid)
    print(f"pairs {int(bins.num_pairs)} padded {int(bins.padded_total)} "
          f"cap {cap} fin {fin_cap}", flush=True)

    packed = jax.jit(pack_entries)(pre)
    to_entries = jax.jit(lambda p, g: p[g].reshape(
        -1, CHUNK, p.shape[1]).transpose(0, 2, 1))

    entries0 = to_entries(packed, jnp.asarray(gid0))
    out0 = time_kernels(entries0, bins.tile_start, bins.tile_count,
                        "A interval (production)")

    # ---- B: exact per-pair cull post-hoc, numpy rebuild ----------------
    slot_tile = np.repeat(np.arange(T, dtype=np.int64), tc0)
    slot_idx = np.concatenate(
        [ts0[t] + np.arange(tc0[t], dtype=np.int64) for t in range(T)]) \
        if T else np.zeros(0, np.int64)
    g_at = gid0[slot_idx]
    keep = exact_keep_np(pre, g_at, slot_tile, ntx)
    print(f"exact cull keeps {int(keep.sum())} of {len(keep)}", flush=True)
    # rebuild chunk-aligned per-tile lists
    new_tc = np.zeros(T, np.int32)
    np.add.at(new_tc, slot_tile[keep], 1)
    padded = (new_tc + CHUNK - 1) // CHUNK * CHUNK
    new_ts = np.zeros(T, np.int32)
    new_ts[1:] = np.cumsum(padded)[:-1]
    P2 = int(new_ts[-1] + padded[-1])
    P2 = max(((P2 + CHUNK - 1) // CHUNK) * CHUNK, CHUNK)
    new_gid = np.zeros(P2, np.int32)
    w = np.where(keep)[0]
    t_k = slot_tile[w]
    # rank within tile preserving order
    order = np.argsort(t_k, kind="stable")
    t_s = t_k[order]
    ranks = np.arange(len(t_s)) - np.repeat(
        np.searchsorted(t_s, np.arange(T), side="left"),
        np.bincount(t_s, minlength=T))
    new_slot = new_ts[t_s] + ranks
    new_gid[new_slot] = g_at[w][order]
    entries1 = to_entries(packed, jnp.asarray(new_gid))
    time_kernels(entries1, jnp.asarray(new_ts), jnp.asarray(new_tc),
                 "B exact-culled")

    # ---- C: never-done tile stats ---------------------------------------
    # a tile can early-exit only if every pixel saturates; proxy: min over
    # pixels of final alpha ~ 1 (out channel 4)
    alpha_min = out0[:, 4, :].min(axis=1)
    nd = alpha_min < 0.9995
    ch0 = (tc0 + CHUNK - 1) // CHUNK
    ch1 = (new_tc + CHUNK - 1) // CHUNK
    print(f"never-saturating tiles: {int(nd.sum())}/{T}; "
          f"chunks there: interval {int(ch0[nd].sum())} "
          f"exact {int(ch1[nd].sum())}; "
          f"chunks saturating: interval {int(ch0[~nd].sum())} "
          f"exact {int(ch1[~nd].sum())}", flush=True)


if __name__ == "__main__":
    main()

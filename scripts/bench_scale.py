"""Scale benchmark: per-stage rasterizer timings at trained-scene-like load.

VERDICT r1 item 1: the round-1 headline (30.7M rays/s) was measured at
100k uniform Gaussians (~520k pairs); trained scenes reach 1M+ splats and
multi-million pair counts. This script measures, per N in {0.5M, 1M, 2M}
at 1080p with the trained-like distribution (gs2d_tpu/utils/bench_scenes):

  preprocess | binning | expansion gather | fwd kernel | bwd kernel |
  bwd glue (inv-gather + segment-sum + scatter) | e2e fwd | e2e fwd+bwd

Appends one JSON line per N to PERF_scale.jsonl (flushed as it goes, so a
timeout keeps partial results). Timing uses chained data-dependent loops
(utils/timing.timed_loop) — block_until_ready does not block on the axon
tunnel. Stage steps consume their real outputs (gid/pair tables, not just
num_pairs) to defeat DCE.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig,
                                        _segment_sum_rows_depth,
                                        pack_entries, rasterize,
                                        suggest_capacities)
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.kernel_bwd import rasterize_bwd_pallas
from gs2d_tpu.ops.rasterize.kernel_fwd import rasterize_fwd_pallas
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
# Overridable: each tile-chunk costs two DMA issues in the backward
# (in + out) regardless of size — if issue overhead dominates at ~20
# chunks/tile, 256/512 amortize it at ~5% padded-slot cost.
CHUNK = int(os.environ.get("BENCH_CHUNK", "128"))


def bench_one(n, out_f, n_iters=8):
    t_wall = time.time()
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(n))

    pre_fn = jax.jit(lambda m, s, q, o, c: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H,
        colors=c))
    pre = pre_fn(means, scales, quats, opac, rgb)
    cap, fin_cap, rows_cap = suggest_capacities(pre, W, H, chunk=CHUNK)
    cfg = RasterizeConfig(width=W, height=H, pairs_capacity=cap,
                          final_capacity=fin_cap, rows_capacity=rows_cap, chunk=CHUNK)
    rec = {"n_gaussians": n, "width": W, "height": H, "pairs_capacity": cap,
           "final_capacity": fin_cap, "chunk": CHUNK}
    print(f"[N={n}] capacity {cap} final {fin_cap}", flush=True)

    bin_fn = jax.jit(lambda c2, ex, dp, vis: bin_gaussians(
        c2, ex, dp, vis, W, H, cap, CHUNK,
        cull_abc=(pre.A, pre.B, pre.C),
        rho2max=pre.rho2max, final_capacity=fin_cap,
        rows_capacity=rows_cap))
    bins = bin_fn(pre.center2d, pre.extent, pre.depth, pre.visible)
    rec["num_pairs"] = int(bins.num_pairs)
    rec["num_expanded"] = int(bins.num_expanded)
    rec["padded_total"] = int(bins.padded_total)
    rec["overflow"] = bool(bins.overflow)
    print(f"[N={n}] pairs {rec['num_pairs']} padded {rec['padded_total']}",
          flush=True)
    packed = jax.jit(pack_entries)(pre)
    gid = bins.gid

    # The Pallas KERNEL stages are timed FIRST, before any measurement
    # loop has churned the allocator: with the preprocess/binning/gather
    # timed loops run first, the bwd-kernel stage reads 2-4x its
    # isolated ~51 ms no matter how its own inputs are constructed
    # (allocator-state-dependent overhead; scripts/diag_bwd_bisect.py
    # measures the perturbation space). Measurement order does not
    # change what each stage measures.

    # ---- stage: fwd kernel --------------------------------------------
    # Argument-passing jit, NOT a closure-captured gid: with gid captured
    # as a constant, the later bwd stage's timed loop reads 2-4x its
    # isolated cost (allocator-state-dependent overhead; see
    # scripts/diag_bwd_bisect.py — any of argument-style construction,
    # pre-cycling entries-shaped transients, or dropping live refs
    # removes it).
    entries = jax.jit(
        lambda p, g: p[g].reshape(-1, CHUNK, p.shape[1]).transpose(0, 2, 1)
    )(packed, gid)                           # (P/chunk, ENTRY_F, chunk) wire
    ts, tc = bins.tile_start, bins.tile_count

    @jax.jit
    def step_fwd(e):
        out, _ = rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                      chunk=CHUNK)
        return e + 1e-30 * jnp.sum(out[::997, :, ::97])

    dt, _ = timed_loop(step_fwd, entries, n=n_iters)
    rec["t_fwd_kernel_ms"] = dt * 1e3

    out_tiles, med_tiles = jax.jit(
        lambda e: rasterize_fwd_pallas(e, ts, tc, width=W, height=H,
                                       chunk=CHUNK))(entries)
    g_tiles = jnp.ones_like(out_tiles)

    # ---- stage: bwd kernel --------------------------------------------
    # Cotangents ride as jit arguments and the loop gets extra warmup —
    # both measured necessary for the stage to read its isolated ~51 ms
    # instead of an allocator-perturbed 2-4x (diag_bwd_bisect.py).
    @jax.jit
    def step_bwd(e, o, g, m):
        d = rasterize_bwd_pallas(e, ts, tc, o, g, m,
                                 width=W, height=H, chunk=CHUNK)
        return e + 1e-30 * jnp.sum(d[::7])
    dt, _ = timed_loop(
        lambda e: step_bwd(e, out_tiles, g_tiles, med_tiles), entries,
        n=n_iters, warmup=6)
    rec["t_bwd_kernel_ms"] = dt * 1e3

    # ---- stage: preprocess (chained via means feedback) --------------
    def step_pre(m):
        p = pre_fn(m, scales, quats, opac, rgb)
        return m + 1e-30 * (jnp.sum(p.center2d[::501]) + jnp.sum(p.A[::503]))
    dt, _ = timed_loop(step_pre, means, n=n_iters)
    rec["t_preprocess_ms"] = dt * 1e3

    # ---- stage: binning (consume gid/inv/tile tables) -----------------
    def step_bin(c2):
        b = bin_fn(c2, pre.extent, pre.depth, pre.visible)
        fb = (jnp.sum(b.gid[::997]) + jnp.sum(b.inv[::1009]) +
              jnp.sum(b.tile_start) + jnp.sum(b.tile_count) +
              jnp.sum(b.seg_start[::499]))
        return c2 + 1e-30 * fb.astype(jnp.float32)
    dt, _ = timed_loop(step_bin, pre.center2d, n=n_iters)
    rec["t_binning_ms"] = dt * 1e3

    # ---- stage: expansion gather (packed[gid] rows) -------------------
    @jax.jit
    def step_gather(p):
        e = p[gid]
        return p + 1e-30 * jnp.sum(e[::1013])
    dt, _ = timed_loop(step_gather, packed, n=n_iters)
    rec["t_gather_ms"] = dt * 1e3

    # ---- stage: bwd glue (slot→expansion gather, segment sum, scatter) -
    from gs2d_tpu.ops.rasterize.common import DENTRY_F, ENTRY_F
    P_slots = entries.shape[0] * CHUNK
    d_raw = jnp.ones((P_slots, DENTRY_F), jnp.float32)
    inv, seg_e_d, inv_order = bins.inv, bins.seg_end_d, bins.inv_order
    P_alloc = P_slots
    N = inv_order.shape[0]

    @jax.jit
    def step_bglue(d):
        ok = inv < P_alloc
        d_pairs = d[jnp.where(ok, inv, 0)]
        d_pairs = jnp.where(ok[:, None], d_pairs, 0.0)
        d_g = _segment_sum_rows_depth(d_pairs, seg_e_d, inv_order)
        d_packed = jnp.concatenate(
            [d_g[:, :12], jnp.zeros((N, 2), d.dtype), d_g[:, 12:]],
            axis=1)
        return d + 1e-30 * jnp.sum(d_packed[::503])
    dt, _ = timed_loop(step_bglue, d_raw, n=n_iters)
    rec["t_bwd_glue_ms"] = dt * 1e3

    # ---- e2e fwd ------------------------------------------------------
    @jax.jit
    def step_e2e_fwd(m):
        p = pre_fn(m, scales, quats, opac, rgb)
        out, _ = rasterize(p, cfg)
        return m + 1e-30 * jnp.sum(out[:, ::97, ::97])
    dt, _ = timed_loop(step_e2e_fwd, means, n=n_iters)
    rec["t_e2e_fwd_ms"] = dt * 1e3

    # ---- e2e fwd+bwd (the headline) ------------------------------------
    cot = jnp.ones((15, H, W), jnp.float32)

    def loss(m, s, q, o, c):
        p = preprocess(m, s, q, o, cam.world_view, cam.full_proj, cam.campos,
                       W, H, colors=c)
        out, _ = rasterize(p, cfg)
        return jnp.sum(out * cot)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    def step_grad(args):
        g = grad(*args)
        return tuple(a - 1e-12 * gi for a, gi in zip(args, g))
    dt, _ = timed_loop(step_grad, (means, scales, quats, opac, rgb),
                       n=n_iters)
    rec["t_e2e_fwd_bwd_ms"] = dt * 1e3
    rec["rays_per_s_fwd_bwd"] = W * H / dt
    rec["wall_s"] = time.time() - t_wall

    out_f.write(json.dumps(rec) + "\n")
    out_f.flush()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ns = [int(x) for x in (sys.argv[1:] or ["500000", "1000000", "2000000"])]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PERF_scale.jsonl"), "a") as f:
        f.write(json.dumps({"ts": time.time(), "event": "run",
                            "devices": str(jax.devices())}) + "\n")
        for n in ns:
            bench_one(n, f)


if __name__ == "__main__":
    main()

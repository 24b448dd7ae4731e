"""Dissect the binning/gather/backward-glue costs at the 1M-splat scene.

PERF_scale.jsonl (r2) showed: gather 242 ms, binning 342 ms, bwd glue
423 ms at ~10.4M pairs — 1s of glue around 370 ms of kernels. This script
times each primitive in isolation (chained, DCE-proof) to find where the
milliseconds actually live.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.api import (_segment_sum_rows, pack_entries,
                                        suggest_pairs_capacity)
from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.bench_scenes import make_trained_like_scene
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
N = 1_000_000


def t(name, fn, state, n=8):
    dt, _ = timed_loop(fn, state, n=n)
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 3.0]), fovx, fovy, W, H)
    means, scales, quats, opac, rgb = (
        jnp.asarray(x) for x in make_trained_like_scene(N))
    pre = jax.jit(lambda m: preprocess(
        m, scales, quats, opac, cam.world_view, cam.full_proj, cam.campos,
        W, H, colors=rgb))(means)
    cap = suggest_pairs_capacity(pre, W, H)
    bins = jax.jit(lambda c2: bin_gaussians(
        c2, pre.extent, pre.depth, pre.visible, W, H, cap, 128))(pre.center2d)
    packed = jax.jit(pack_entries)(pre)                  # (N, 24)
    gid = bins.gid                                        # (P,)
    P = int(gid.shape[0])
    print(f"N={N} P_alloc={P} pairs={int(bins.num_pairs)}", flush=True)

    # --- gather variants -------------------------------------------------
    t("gather rows packed[gid] (no T)",
      jax.jit(lambda p: p + 1e-30 * jnp.sum(p[gid][::1013])), packed)
    t("gather rows + .T (the current form)",
      jax.jit(lambda p: p + 1e-30 * jnp.sum(p[gid].T[:, ::1013])), packed)
    big = jnp.zeros((P, 24), jnp.float32) + 1.0
    t("transpose (P,24)->(24,P) alone",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(x.T[:, ::1013])), big)
    gid_sorted = jnp.sort(gid)
    t("gather rows, MONOTONE ids",
      jax.jit(lambda p: p + 1e-30 * jnp.sum(p[gid_sorted][::1013])), packed)
    perm = jax.random.permutation(jax.random.PRNGKey(0), P)
    t("P->P permutation row gather (P,24)",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(x[perm][::1013])), big)
    pb16 = packed.astype(jnp.bfloat16)
    t("gather rows bf16 table",
      jax.jit(lambda p: p + 1e-30 * jnp.sum(p[gid][::1013]
                                            .astype(jnp.float32))), pb16)
    # one-hot? no. take_along_axis variant:
    t("jnp.take axis0",
      jax.jit(lambda p: p + 1e-30 * jnp.sum(jnp.take(p, gid, axis=0,
                                                     indices_are_sorted=False,
                                                     unique_indices=False)
                                            [::1013])), packed)

    # --- backward glue split ---------------------------------------------
    d_raw = jnp.ones((24, P), jnp.float32)
    inv, seg_s, seg_e, order = (bins.inv, bins.seg_start, bins.seg_end,
                                bins.order)

    t("bwd: d.T alone ((24,P)->(P,24))",
      jax.jit(lambda d: d + 1e-30 * jnp.sum(d.T[::1013])), d_raw)
    dT = jnp.ones((P, 24), jnp.float32)
    ok = inv < P
    inv_c = jnp.where(ok, inv, 0)
    t("bwd: dT[inv] perm gather + mask",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(
          jnp.where(ok[:, None], x[inv_c], 0.0)[::1013])), dT)
    t("bwd: segment_sum_rows alone",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(
          _segment_sum_rows(x, seg_s, seg_e)[::503])), dT)
    d_sorted = jnp.ones((N, 24), jnp.float32)
    t("bwd: zeros.at[order].set alone",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(
          jnp.zeros((N, 24), jnp.float32).at[order].set(x)[::503])),
      d_sorted)

    # --- binning split ----------------------------------------------------
    depth_key = jnp.where(pre.visible, pre.depth, jnp.inf)
    t("bin: depth argsort (N)",
      jax.jit(lambda x: x + 1e-30 * jnp.sum(
          jnp.argsort(x, stable=True)[::503].astype(jnp.float32))),
      depth_key)

    key = jax.random.randint(jax.random.PRNGKey(1), (P,), 0, 4096,
                             dtype=jnp.int32)
    g2 = jax.random.randint(jax.random.PRNGKey(2), (P,), 0, N,
                            dtype=jnp.int32)
    slots = jnp.arange(P, dtype=jnp.int32)
    t("bin: 3-operand stable sort (P)",
      jax.jit(lambda k: k + (1e-30 * jnp.sum(jax.lax.sort(
          (k, g2, slots), num_keys=1, is_stable=True)[1][::1013]
      ).astype(jnp.int32))), key)

    starts = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (N,), 0, P,
                                         dtype=jnp.int32))
    t("bin: scatter-max + cummax (P)",
      jax.jit(lambda s: s + (1e-30 * jnp.sum(jax.lax.cummax(
          jnp.zeros((P,), jnp.int32).at[s].max(
              jnp.arange(N, dtype=jnp.int32), mode="drop"))[::1013]
      ).astype(jnp.int32))), starts)

    gtab = jnp.ones((N, 4), jnp.int32)
    gidx = jnp.sort(g2)
    t("bin: (N,4) row gather by P monotone ids",
      jax.jit(lambda g: g + (1e-30 * jnp.sum(g[gidx][::1013])
                             ).astype(jnp.int32)), gtab)
    t("bin: P-size scatter set (gid1)",
      jax.jit(lambda v: v + (1e-30 * jnp.sum(
          jnp.zeros((P,), jnp.int32).at[perm].set(v, mode="drop")[::1013]
      )).astype(jnp.int32)), slots)
    tiles = jnp.arange(4080, dtype=jnp.int32)
    key_s = jnp.sort(key)
    t("bin: searchsorted T queries over P",
      jax.jit(lambda k: k + (1e-30 * jnp.sum(
          jnp.searchsorted(k, tiles, side="left"))).astype(jnp.int32)),
      key_s)


if __name__ == "__main__":
    main()

"""Stage-level microbench of bin_gaussians with outputs actually consumed.

The earlier profiler only consumed num_pairs, which DCE'd the whole sort/
scatter pipeline — the 'gather' stage then paid for it. Here each variant
consumes everything it computes (sum through a chain).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ops.rasterize.binning import _div_floor_f32, cdiv_arr
from gs2d_tpu.ops.rasterize.common import TILE_H, TILE_W, cdiv
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from gs2d_tpu.scene.cameras import make_camera
from gs2d_tpu.utils.timing import timed_loop

W, H = 1920, 1080
N = 100_000
CAP = 1 << 20
CHUNK = 128


def make_inputs():
    fovx = math.radians(70)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), fovx, fovy, W, H)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.03, (N, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)).astype(np.float32))
    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, o, cam.world_view, cam.full_proj, cam.campos, W, H))(
        means, scales, quats, opac)
    return (np.asarray(pre.center2d), np.asarray(pre.extent),
            np.asarray(pre.depth), np.asarray(pre.visible))


def main():
    c2d, ext, dep, vis = (jnp.asarray(x) for x in make_inputs())
    ntx, nty = cdiv(W, TILE_W), cdiv(H, TILE_H)
    T = ntx * nty

    def chain(val, args):
        return tuple(a + 1e-30 * val.astype(a.dtype)
                     if a.dtype.kind == "f" else a for a in args)

    def stage(args, upto):
        center2d, extent, depth, visible = args
        depth_key = jnp.where(visible, depth, jnp.inf)
        g_order = jnp.argsort(depth_key, stable=True)
        cx = center2d[g_order, 0]; cy = center2d[g_order, 1]
        ex = extent[g_order, 0]; ey = extent[g_order, 1]
        vi = visible[g_order]
        tx0 = jnp.clip(jnp.floor((cx - ex) / TILE_W).astype(jnp.int32), 0, ntx)
        tx1 = jnp.clip((jnp.floor((cx + ex) / TILE_W) + 1).astype(jnp.int32), 0, ntx)
        ty0 = jnp.clip(jnp.floor((cy - ey) / TILE_H).astype(jnp.int32), 0, nty)
        ty1 = jnp.clip((jnp.floor((cy + ey) / TILE_H) + 1).astype(jnp.int32), 0, nty)
        rw = jnp.maximum(tx1 - tx0, 0); rh = jnp.maximum(ty1 - ty0, 0)
        counts = jnp.where(vi, rw * rh, 0)
        cum = jnp.cumsum(counts); total = cum[-1]
        if upto == "rects":
            return chain(total.astype(jnp.float32), args)
        slots = jnp.arange(CAP, dtype=jnp.int32)
        starts = cum - counts
        seg_src = jnp.where(counts > 0, starts, CAP)
        seg = jnp.zeros((CAP,), jnp.int32).at[seg_src].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        gidx = jax.lax.cummax(seg)
        gidx_c = jnp.minimum(gidx, N - 1)
        if upto == "ownership":
            return chain(jnp.sum(gidx_c[::4096].astype(jnp.float32)), args)
        tile0 = ty0 * ntx + tx0
        gtab = jnp.stack([starts, jnp.maximum(rw, 1), tile0,
                          g_order.astype(jnp.int32)], axis=1)
        grec = gtab[gidx_c]
        k = slots - grec[:, 0]
        w_i = grec[:, 1]
        dty = _div_floor_f32(k, w_i)
        dtx = k - dty * w_i
        pair_valid = slots < total
        tile = grec[:, 2] + dty * ntx + dtx
        tile_key = jnp.where(pair_valid, tile, T).astype(jnp.int32)
        pair_gid = grec[:, 3]
        if upto == "keys":
            return chain(jnp.sum(tile_key[::4096].astype(jnp.float32)), args)
        key_sorted, gid_sorted, p_sorted = jax.lax.sort(
            (tile_key, pair_gid, slots), num_keys=1, is_stable=True)
        if upto == "sort":
            return chain(jnp.sum(key_sorted[::4096].astype(jnp.float32) +
                                 gid_sorted[::4096].astype(jnp.float32) +
                                 p_sorted[::4096].astype(jnp.float32)), args)
        tiles = jnp.arange(T, dtype=jnp.int32)
        left = jnp.searchsorted(key_sorted, tiles, side="left").astype(jnp.int32)
        right = jnp.searchsorted(key_sorted, tiles, side="right").astype(jnp.int32)
        tile_count = right - left
        padded = cdiv_arr(tile_count, CHUNK) * CHUNK
        aligned_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        if upto == "ranges":
            return chain(jnp.sum(aligned_start[::64].astype(jnp.float32)), args)
        avail = jnp.maximum(CAP - aligned_start, 0)
        tile_count = jnp.minimum(tile_count, avail)
        ttab = jnp.stack([left, aligned_start, aligned_start + tile_count], 1)
        trec = ttab[jnp.minimum(key_sorted, T - 1)]
        rank = jnp.arange(CAP, dtype=jnp.int32) - trec[:, 0]
        new_slot = trec[:, 1] + rank
        entry_ok = (key_sorted < T) & (new_slot < trec[:, 2])
        new_slot = jnp.where(entry_ok, new_slot, CAP)
        if upto == "slots":
            return chain(jnp.sum(new_slot[::4096].astype(jnp.float32)), args)
        gid1 = jnp.zeros((CAP,), jnp.int32).at[new_slot].set(
            gid_sorted + 1, mode="drop")
        if upto == "scatter1":
            return chain(jnp.sum(gid1[::4096].astype(jnp.float32)), args)
        inv = jnp.full((CAP,), CAP, jnp.int32).at[p_sorted].set(
            new_slot, mode="drop")
        return chain(jnp.sum(gid1[::4096].astype(jnp.float32) +
                             inv[::4096].astype(jnp.float32)), args)

    import functools
    args0 = (c2d, ext, dep, vis)
    for name in ["rects", "ownership", "keys", "sort", "ranges", "slots",
                 "scatter1", "all"]:
        fn = jax.jit(functools.partial(stage, upto=name))
        t, _ = timed_loop(fn, args0, n=10)
        print(f"upto {name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.devices())
    main()

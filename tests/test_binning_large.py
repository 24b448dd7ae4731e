"""Binning bookkeeping exactness ABOVE the old 2^24 pair ceiling.

Post-extent-fix 1080p trained scenes demand 22-31M pre-cull pairs
(PERF_scale.jsonl r3), which overflowed the original f32-packed slot
bookkeeping (exact only to 2^24). The fix carries each Gaussian's
expansion start slot as an exact base-4096 (hi, lo) f32 pair
(binning._START_BASE). This test drives ~18.9M pairs — so the last
Gaussians' start slots exceed 2^24 — through ``bin_gaussians`` and
checks the ENTIRE slot assignment (gid, validity, tile ranges) exactly
against an independent numpy model of the contract (expansion in depth
order, stable tile sort, chunk-aligned per-tile starts; reference
semantics: CUDA (tile|depth) radix sort, SURVEY.md §2.1 step 2).
"""

import numpy as np

from gs2d_tpu.ops.rasterize.binning import bin_gaussians
from gs2d_tpu.ops.rasterize.common import TILE_H, TILE_W


def test_binning_exact_above_2pow24():
    rng = np.random.default_rng(7)
    W, H = 4096, 2048
    ntx, nty = W // TILE_W, H // TILE_H
    N = 16384
    chunk = 128

    # Rects ~34x34 tiles -> ~1156 pairs each, total ~18.9M (> 2^24).
    cx = rng.uniform(0, W, N).astype(np.float32)
    cy = rng.uniform(0, H, N).astype(np.float32)
    ex = rng.uniform(16.5, 17.5, N).astype(np.float32) * TILE_W
    ey = rng.uniform(16.5, 17.5, N).astype(np.float32) * TILE_H
    depth = rng.permutation(N).astype(np.float32) + 0.5  # distinct
    visible = np.ones(N, bool)
    visible[::97] = False

    # numpy model of the contract --------------------------------------
    tx0 = np.clip(np.floor((cx - ex) / TILE_W).astype(np.int64), 0, ntx)
    tx1 = np.clip(np.floor((cx + ex) / TILE_W).astype(np.int64) + 1, 0, ntx)
    ty0 = np.clip(np.floor((cy - ey) / TILE_H).astype(np.int64), 0, nty)
    ty1 = np.clip(np.floor((cy + ey) / TILE_H).astype(np.int64) + 1, 0, nty)
    rw = np.maximum(tx1 - tx0, 0)
    rh = np.maximum(ty1 - ty0, 0)
    counts = np.where(visible, rw * rh, 0)

    order = np.argsort(np.where(visible, depth, np.inf), kind="stable")
    counts_d, rw_d = counts[order], rw[order]
    tx0_d, ty0_d = tx0[order], ty0[order]
    total = int(counts_d.sum())
    assert total > (1 << 24), total

    owner = np.repeat(np.arange(N), counts_d)           # depth-sorted idx
    k = np.arange(total) - np.repeat(
        np.cumsum(counts_d) - counts_d, counts_d)
    dty, dtx = np.divmod(k, np.maximum(rw_d[owner], 1))
    tile = (ty0_d[owner] + dty) * ntx + (tx0_d[owner] + dtx)

    perm = np.argsort(tile, kind="stable")              # keeps depth order
    tile_sorted = tile[perm]
    gid_sorted = order[owner][perm]

    T = ntx * nty
    left = np.searchsorted(tile_sorted, np.arange(T), side="left")
    right = np.searchsorted(tile_sorted, np.arange(T), side="right")
    tcount = right - left
    padded = -(-tcount // chunk) * chunk
    astart = np.concatenate([[0], np.cumsum(padded)[:-1]])
    padded_total = int(astart[-1] + padded[-1])

    cap = 21_000_064                                    # 128-aligned
    assert padded_total <= cap
    ref_gid = np.zeros(cap, np.int32)
    ref_valid = np.zeros(cap, bool)
    slot_of_pair = astart[tile_sorted] + (np.arange(total) - left[tile_sorted])
    ref_gid[slot_of_pair] = gid_sorted
    ref_valid[slot_of_pair] = True

    # the implementation ------------------------------------------------
    import jax.numpy as jnp
    bins = bin_gaussians(
        jnp.asarray(np.stack([cx, cy], 1)), jnp.asarray(np.stack([ex, ey], 1)),
        jnp.asarray(depth), jnp.asarray(visible), W, H,
        pairs_capacity=cap, chunk=chunk)

    assert not bool(bins.overflow)
    assert int(bins.num_pairs) == total
    assert int(bins.padded_total) == padded_total
    np.testing.assert_array_equal(np.asarray(bins.tile_count), tcount)
    np.testing.assert_array_equal(np.asarray(bins.tile_start), astart)
    np.testing.assert_array_equal(np.asarray(bins.slot_valid), ref_valid)
    got_gid = np.asarray(bins.gid)
    np.testing.assert_array_equal(np.where(ref_valid, got_gid, 0),
                                  np.where(ref_valid, ref_gid, 0))

    # gradient side tables: expansion pair -> slot must invert exactly
    inv = np.asarray(bins.inv)[:total]
    assert (inv < cap).all()
    np.testing.assert_array_equal(ref_gid[inv], order[owner])
    seg_start = np.asarray(bins.seg_start)
    seg_end = np.asarray(bins.seg_end)
    # bounds are emitted in ORIGINAL gaussian order; widths match the
    # per-gaussian pair counts and, viewed in depth order, the segments
    # tile [0, total) contiguously
    np.testing.assert_array_equal(
        seg_end - seg_start, counts.astype(np.int32))
    np.testing.assert_array_equal(
        seg_start[order],
        (np.cumsum(counts_d) - counts_d).astype(np.int32))

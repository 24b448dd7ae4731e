"""Tile binning (pure jnp, non-differentiable).

Replaces the reference CUDA duplicate+radix-sort binning (SURVEY.md §2.1
step 2) with a TPU-friendly fixed-capacity pipeline:

1. stable argsort of Gaussians by view depth (culled → +inf, pushed last);
2. per-Gaussian tile rectangles from the dual-conic screen extents;
3. duplicated (gaussian, tile) pair expansion into a static-capacity slot
   array (no dynamic shapes): slot→Gaussian ownership via a scatter +
   running-max scan, per-slot attributes via ONE packed row-gather;
4. one stable sort on the tile key — entries arrive depth-ordered, so the
   stable sort leaves every tile's list depth-ordered (the CUDA 64-bit
   (tile|depth) radix sort collapses to a single 32-bit key sort);
5. per-tile ranges with CHUNK-aligned starts, so the Pallas kernels can DMA
   whole chunks without ever touching a neighboring tile's slots (TPU has
   no atomics and no masked DMA — alignment replaces both).

Performance notes (measured on v5e): 1-D gathers/searchsorted with ~2M
queries are pathologically slow on TPU (a 17-step binary search of 2M
queries ≈ 250 ms; five separate 1-D table gathers ≈ 70 ms), while ROW
gathers of packed multi-column records cost ~3 ms for the same query
count. Integer div/mod by a runtime divisor is also slow — replaced with
exact f32 division (operands ≤ 2^24 with an epsilon guard).

Everything here is integer bookkeeping wrapped in stop_gradient by callers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import TILE_H, TILE_W, cdiv


class BinningOut(NamedTuple):
    gid: jnp.ndarray         # (P_alloc,) int32 gaussian id per slot (0 if pad)
    slot_valid: jnp.ndarray  # (P_alloc,) bool — real entry occupies slot
    tile_start: jnp.ndarray  # (T,) int32 CHUNK-aligned start slot per tile
    tile_count: jnp.ndarray  # (T,) int32 true entry count per tile
    num_pairs: jnp.ndarray   # () int32 total real pairs (pre-clamp)
    padded_total: jnp.ndarray  # () int32 chunk-padded slot need (true demand)
    overflow: jnp.ndarray    # () bool — capacity exceeded, tails dropped
    # Gradient-reduction side tables: expansion order (pairs grouped
    # contiguously per depth-sorted Gaussian) → binned slot. The gather
    # VJP reduces per-Gaussian gradients with contiguous segment sums
    # instead of a scatter-add (which collapses to ~0.3 G adds/s once the
    # accumulator exceeds VMEM).
    inv: jnp.ndarray          # (P_alloc,) int32 expansion pair → slot (P_alloc if dropped)
    seg_start: jnp.ndarray    # (N,) int32 expansion segment start, clamped
    seg_end: jnp.ndarray      # (N,) int32 expansion segment end, clamped
    order: jnp.ndarray        # (N,) int32 depth-sorted → original Gaussian id


def alloc_size(pairs_capacity: int, num_tiles: int, chunk: int) -> int:
    """Slot-array allocation. ``pairs_capacity`` bounds the CHUNK-padded
    slot total (real pairs + per-tile alignment padding), so the
    allocation is exactly the capacity — the caller's overflow-growth
    loop (train/loop.py) absorbs scenes that exceed it. Keeping every
    capacity-proportional cost (sort, scatter, expansion gather, the
    kernels' d_entries) tied to ONE knob roughly halves the binning+
    gather cost vs a worst-case + T·chunk headroom."""
    return pairs_capacity


def _div_floor_f32(k: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(k/w) for 0 <= k < 2^24, 1 <= w, via f32 (int div by a
    runtime divisor is slow on TPU). The epsilon absorbs the <1 ulp f32
    rounding of exact multiples."""
    q = jnp.floor(k.astype(jnp.float32) / w.astype(jnp.float32) + 1e-5)
    return q.astype(jnp.int32)


def bin_gaussians(center2d: jnp.ndarray, extent: jnp.ndarray,
                  depth: jnp.ndarray, visible: jnp.ndarray,
                  width: int, height: int,
                  pairs_capacity: int, chunk: int) -> BinningOut:
    N = center2d.shape[0]
    ntx = cdiv(width, TILE_W)
    nty = cdiv(height, TILE_H)
    T = ntx * nty
    P_alloc = alloc_size(pairs_capacity, T, chunk)

    depth_key = jnp.where(visible, depth, jnp.inf)
    g_order = jnp.argsort(depth_key, stable=True)          # (N,) front→back

    # Tile rects elementwise in ORIGINAL order, then ONE packed row-gather
    # into depth order (several separate 1-D gathers cost ~1 ms each on
    # v5e; a multi-column row gather is nearly free).
    cx0, cy0 = center2d[:, 0], center2d[:, 1]
    ex0, ey0 = extent[:, 0], extent[:, 1]
    tx0 = jnp.clip(jnp.floor((cx0 - ex0) / TILE_W).astype(jnp.int32), 0, ntx)
    tx1 = jnp.clip((jnp.floor((cx0 + ex0) / TILE_W) + 1).astype(jnp.int32),
                   0, ntx)
    ty0 = jnp.clip(jnp.floor((cy0 - ey0) / TILE_H).astype(jnp.int32), 0, nty)
    ty1 = jnp.clip((jnp.floor((cy0 + ey0) / TILE_H) + 1).astype(jnp.int32),
                   0, nty)
    rw0 = jnp.maximum(tx1 - tx0, 0)
    rh0 = jnp.maximum(ty1 - ty0, 0)
    rtab = jnp.stack([jnp.where(visible, rw0 * rh0, 0), rw0,
                      ty0 * ntx + tx0], axis=1)[g_order]    # (N, 3)
    counts, rw, tile0 = rtab[:, 0], rtab[:, 1], rtab[:, 2]

    cum = jnp.cumsum(counts)                               # inclusive
    total = cum[-1]
    num_pairs = total

    # Expand pairs into pair_capacity slots. Which Gaussian owns slot s is
    # searchsorted(cum, s, 'right'), but a binary search with 2M queries is
    # ~17 chained 2M-gathers. Equivalent scatter+scan: drop each Gaussian's
    # index at its start slot, then a running max — slots in
    # [start_i, start_i+count_i) see exactly i (later starts lie beyond,
    # zero-count Gaussians are dropped, ties telescope to the owner).
    slots = jnp.arange(pairs_capacity, dtype=jnp.int32)
    starts = cum - counts
    seg_src = jnp.where(counts > 0, starts, pairs_capacity)
    seg = jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    gidx = jax.lax.cummax(seg)
    gidx_c = jnp.minimum(gidx, N - 1)

    # ONE packed row-gather for all per-slot Gaussian attributes.
    gtab = jnp.stack([starts, jnp.maximum(rw, 1), tile0,
                      g_order.astype(jnp.int32)], axis=1)   # (N, 4)
    grec = gtab[gidx_c]                                     # (P, 4)
    k = slots - grec[:, 0]
    w_i = grec[:, 1]
    dty = _div_floor_f32(k, w_i)
    dtx = k - dty * w_i
    pair_valid = slots < total
    tile = grec[:, 2] + dty * ntx + dtx
    tile_key = jnp.where(pair_valid, tile, T).astype(jnp.int32)
    pair_gid = grec[:, 3]

    # Stable sort by tile key; depth order is preserved within each tile.
    # The third operand carries the expansion-order pair index so the
    # gradient path can invert the slot permutation.
    key_sorted, gid_sorted, p_sorted = jax.lax.sort(
        (tile_key, pair_gid, slots), num_keys=1, is_stable=True)

    # Per-tile true counts and CHUNK-aligned starts.
    tiles = jnp.arange(T, dtype=jnp.int32)
    left = jnp.searchsorted(key_sorted, tiles, side="left").astype(jnp.int32)
    right = jnp.searchsorted(key_sorted, tiles, side="right").astype(jnp.int32)
    tile_count = right - left
    padded = cdiv_arr(tile_count, chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    padded_total = aligned_start[-1] + padded[-1]   # chunk-padded slot need
    overflow = (padded_total > P_alloc) | (total > pairs_capacity)
    # Clamp so every tile's padded range fits inside the allocation.
    avail = jnp.maximum(P_alloc - aligned_start, 0)
    tile_count = jnp.minimum(tile_count, avail)

    # Scatter entries to aligned slots — per-slot tile attributes again via
    # ONE packed row-gather (left, aligned_start, aligned_end).
    # NOTE (measured, v5e 2026-08-17): a scatter-free routing variant
    # (T-sized scatter + cummax ownership + row gathers, with the gradient
    # reorder as a 25-operand stable sort) looked ~7 ms cheaper on paper,
    # but in composition it ran SLOWER (fwd 54 ms vs 44 ms) and its
    # backward block blew XLA compile time from ~40 s to >15 min. The two
    # P-sized scatter-sets below are the fast-compiling, fast-running form.
    ttab = jnp.stack([left, aligned_start, aligned_start + tile_count],
                     axis=1)                                # (T, 3)
    trec = ttab[jnp.minimum(key_sorted, T - 1)]             # (P, 3)
    rank = jnp.arange(pairs_capacity, dtype=jnp.int32) - trec[:, 0]
    new_slot = trec[:, 1] + rank
    entry_ok = (key_sorted < T) & (new_slot < trec[:, 2])
    new_slot = jnp.where(entry_ok, new_slot, P_alloc)  # dropped if out of range

    # One fused scatter: store gid+1 so empty slots read 0 ⇒ invalid.
    gid1 = jnp.zeros((P_alloc,), jnp.int32).at[new_slot].set(
        gid_sorted + 1, mode="drop")
    slot_valid = gid1 > 0
    gid = jnp.maximum(gid1 - 1, 0)

    # expansion pair index → final slot (dropped pairs map to P_alloc)
    inv = jnp.full((P_alloc,), P_alloc, jnp.int32).at[p_sorted].set(
        new_slot, mode="drop")
    seg_start = jnp.minimum(starts, pairs_capacity)
    seg_end = jnp.minimum(cum, pairs_capacity)

    return BinningOut(
        gid=gid, slot_valid=slot_valid,
        tile_start=aligned_start, tile_count=tile_count,
        num_pairs=num_pairs, padded_total=padded_total, overflow=overflow,
        inv=inv, seg_start=seg_start, seg_end=seg_end,
        order=g_order.astype(jnp.int32),
    )


def cdiv_arr(a, b: int):
    return -(-a // b)

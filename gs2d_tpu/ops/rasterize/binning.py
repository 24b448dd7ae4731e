"""Tile binning (pure jnp, non-differentiable).

Replaces the reference CUDA duplicate+radix-sort binning (SURVEY.md §2.1
step 2) with a TPU-friendly fixed-capacity pipeline:

1. stable argsort of Gaussians by view depth (culled → +inf, pushed last);
2. per-Gaussian tile rectangles from the dual-conic screen extents;
3. duplicated (gaussian, tile) pair expansion into a static-capacity slot
   array via vectorized searchsorted (no dynamic shapes);
4. one stable sort on the tile key — entries arrive depth-ordered, so the
   stable sort leaves every tile's list depth-ordered (the CUDA 64-bit
   (tile|depth) radix sort collapses to a single 32-bit key sort);
5. per-tile ranges with CHUNK-aligned starts, so the Pallas kernels can DMA
   whole chunks without ever touching a neighboring tile's slots (TPU has
   no atomics and no masked DMA — alignment replaces both).

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
    overflow: jnp.ndarray    # () bool — capacity exceeded, tails dropped


def alloc_size(pairs_capacity: int, num_tiles: int, chunk: int) -> int:
    """Slot-array allocation: capacity plus per-tile alignment headroom."""
    return pairs_capacity + num_tiles * chunk


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

    cx = center2d[g_order, 0]
    cy = center2d[g_order, 1]
    ex = extent[g_order, 0]
    ey = extent[g_order, 1]
    vis = visible[g_order]

    tx0 = jnp.clip(jnp.floor((cx - ex) / TILE_W).astype(jnp.int32), 0, ntx)
    tx1 = jnp.clip((jnp.floor((cx + ex) / TILE_W) + 1).astype(jnp.int32), 0, ntx)
    ty0 = jnp.clip(jnp.floor((cy - ey) / TILE_H).astype(jnp.int32), 0, nty)
    ty1 = jnp.clip((jnp.floor((cy + ey) / TILE_H) + 1).astype(jnp.int32), 0, nty)
    rw = jnp.maximum(tx1 - tx0, 0)
    rh = jnp.maximum(ty1 - ty0, 0)
    counts = jnp.where(vis, rw * rh, 0)                    # (N,)

    cum = jnp.cumsum(counts)                               # inclusive
    total = cum[-1]
    num_pairs = total

    # Expand pairs into pair_capacity slots.
    slots = jnp.arange(pairs_capacity, dtype=jnp.int32)
    gidx = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    gidx_c = jnp.minimum(gidx, N - 1)
    base = cum[gidx_c] - counts[gidx_c]
    k = slots - base
    pair_valid = slots < total
    w_i = jnp.maximum(rw[gidx_c], 1)
    dtx = k % w_i
    dty = k // w_i
    tile = (ty0[gidx_c] + dty) * ntx + (tx0[gidx_c] + dtx)
    tile_key = jnp.where(pair_valid, tile, T).astype(jnp.int32)
    pair_gid = g_order[gidx_c].astype(jnp.int32)

    # Stable sort by tile key; depth order is preserved within each tile.
    key_sorted, gid_sorted = jax.lax.sort(
        (tile_key, pair_gid), num_keys=1, is_stable=True)

    # Per-tile true counts and CHUNK-aligned starts.
    tiles = jnp.arange(T, dtype=jnp.int32)
    left = jnp.searchsorted(key_sorted, tiles, side="left").astype(jnp.int32)
    right = jnp.searchsorted(key_sorted, tiles, side="right").astype(jnp.int32)
    tile_count = right - left
    padded = cdiv_arr(tile_count, chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    overflow = ((aligned_start[-1] + padded[-1]) > P_alloc) | (total > pairs_capacity)
    # Clamp so every tile's padded range fits inside the allocation.
    avail = jnp.maximum(P_alloc - aligned_start, 0)
    tile_count = jnp.minimum(tile_count, avail)

    # Scatter entries to aligned slots: rank within tile + aligned start.
    rank = jnp.arange(pairs_capacity, dtype=jnp.int32) - left[
        jnp.minimum(key_sorted, T - 1)]
    entry_ok = (key_sorted < T) & (rank < tile_count[jnp.minimum(key_sorted, T - 1)])
    new_slot = jnp.where(
        entry_ok,
        aligned_start[jnp.minimum(key_sorted, T - 1)] + rank,
        P_alloc,  # dropped (out-of-bounds scatter → discarded)
    )
    gid = jnp.zeros((P_alloc,), jnp.int32).at[new_slot].set(
        gid_sorted, mode="drop")
    slot_valid = jnp.zeros((P_alloc,), bool).at[new_slot].set(
        True, mode="drop")

    return BinningOut(
        gid=gid, slot_valid=slot_valid,
        tile_start=aligned_start, tile_count=tile_count,
        num_pairs=num_pairs, overflow=overflow,
    )


def cdiv_arr(a, b: int):
    return -(-a // b)

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

from .common import FILTER_INV_SQUARE, TILE_H, TILE_W, cdiv

# Pair-capacity ceiling. Bookkeeping is int32 (exact to 2^31); the only
# f32-packed column that carries capacity-scale integers — each
# Gaussian's expansion start slot — rides the attribute table as an
# exact (hi, lo) base-4096 pair, both halves < 2^24. Post-extent-fix
# 1080p trained-scene demand measured 22–31M pre-cull pairs at 0.5–2M
# splats (r3), so the old 2^24 bookkeeping ceiling was no longer
# enough; 2^25 (33.5M) is the HBM budget line — the capacity-sized
# attribute stream is ~2.4 GB blocked at 2^25. Gaussian COUNT N stays
# ≤ 2^24 (its ids ride single f32 columns).
MAX_PAIRS_CAPACITY = 1 << 25
MAX_GAUSSIANS = 1 << 24
_START_BASE = 4096  # base-4096 split keeps both halves exact in f32
_GB = 128           # lane-blocking of the per-slot attribute gather


class BinningOut(NamedTuple):
    gid: jnp.ndarray         # (P_fin,) int32 gaussian id per slot (0 if pad)
    slot_valid: jnp.ndarray  # (P_fin,) bool — real entry occupies slot
    tile_start: jnp.ndarray  # (T,) int32 CHUNK-aligned start slot per tile
    tile_count: jnp.ndarray  # (T,) int32 true entry count per tile
    num_pairs: jnp.ndarray   # () int32 surviving pairs (post-cull, pre-clamp)
    padded_total: jnp.ndarray  # () int32 chunk-padded slot need (true demand)
    overflow: jnp.ndarray    # () bool — capacity exceeded, tails dropped
    # Gradient-reduction side tables in COMPACT coordinates: the culled
    # expansion order (surviving pairs packed densely, still grouped
    # contiguously per depth-sorted Gaussian) → binned slot. The gather
    # VJP reduces per-Gaussian gradients with contiguous segment sums
    # instead of a scatter-add (which collapses to ~0.3 G adds/s once the
    # accumulator exceeds VMEM); compact sizing keeps those stages at
    # final_capacity, not the ~2x larger bbox-expansion capacity.
    inv: jnp.ndarray          # (P_fin,) int32 compact pair → slot (P_fin if dropped)
    seg_start: jnp.ndarray    # (N,) int32 compact segment start, clamped
    seg_end: jnp.ndarray      # (N,) int32 compact segment end, clamped
    order: jnp.ndarray        # (N,) int32 depth-sorted → original Gaussian id
    num_expanded: jnp.ndarray  # () int32 pre-cull expansion pair demand


def alloc_size(pairs_capacity: int) -> int:
    """Slot-array allocation = exactly the capacity: it bounds the
    CHUNK-padded slot total (real pairs + per-tile alignment padding),
    and the caller's overflow-growth loop (train/loop.py) absorbs scenes
    that exceed it. Keeping every capacity-proportional cost (sort,
    scatter, expansion gather, the kernels' d_entries) tied to ONE knob
    roughly halves the binning+gather cost vs worst-case headroom."""
    return pairs_capacity


def _div_floor_f32(k: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(k/w) for 0 <= k < 2^24, 1 <= w, via f32 (int div by a
    runtime divisor is slow on TPU). The epsilon absorbs the <1 ulp f32
    rounding of exact multiples."""
    q = jnp.floor(k.astype(jnp.float32) / w.astype(jnp.float32) + 1e-5)
    return q.astype(jnp.int32)


def _pair_contributes(col, tx: jnp.ndarray, ty: jnp.ndarray,
                      width: int, height: int) -> jnp.ndarray:
    """Exact contribution test of pair (gaussian, tile) against the
    kernels' per-pixel condition (kernel_common.chunk_geometry):
    a pixel composites iff min(rho3d, rho2d) <= rho2max, with
    rho3d = (P0^2+P1^2)/P2^2 and rho2d the low-pass screen distance.

    rho3d: some tile pixel passes iff min over the tile's continuous
    pixel-center rect of Q(x,y) = P0^2 + P1^2 - rho2max*P2^2 is <= 0.
    The exact continuous min of a (possibly indefinite) quadratic over a
    rect is attained at the interior critical point (when the Hessian is
    SPD and the point is inside) or on the boundary — 4 corner values
    plus, per edge, the clamped 1-D vertex when that edge's curvature is
    positive. The continuous min lower-bounds the discrete pixel min, so
    dropping on "min > 0" never drops a contributing pixel; CULL_MARGIN
    (folded into rho2max upstream) absorbs f32 form differences.

    rho2d: exact — clamp the filter center to the rect.
    """
    a0, a1, a2 = col(5), col(6), col(7)
    b0, b1, b2 = col(8), col(9), col(10)
    cc0, cc1, cc2 = col(11), col(12), col(13)
    cx, cy, r2m = col(14), col(15), col(16)

    x0 = (tx * TILE_W).astype(jnp.float32)
    x1 = jnp.minimum(x0 + (TILE_W - 1), width - 1.0)
    y0 = (ty * TILE_H).astype(jnp.float32)
    y1 = jnp.minimum(y0 + (TILE_H - 1), height - 1.0)

    def Q(x, y):
        # FMA form — same conditioning as the kernels' per-pixel geometry
        # (the expanded 6-coefficient quadratic cancels catastrophically:
        # ~1e8 intermediates vs an O(1) result swallow any fixed margin).
        p0 = a0 + b0 * x + cc0 * y
        p1 = a1 + b1 * x + cc1 * y
        p2 = a2 + b2 * x + cc2 * y
        return p0 * p0 + p1 * p1 - r2m * p2 * p2

    # Expanded coefficients are used only to LOCATE candidate minima —
    # a slightly-off vertex inflates the evaluated value quadratically
    # (harmless), while the value itself is always the FMA form above.
    qxx = b0 * b0 + b1 * b1 - r2m * b2 * b2
    qyy = cc0 * cc0 + cc1 * cc1 - r2m * cc2 * cc2
    qxy = b0 * cc0 + b1 * cc1 - r2m * b2 * cc2
    qx = a0 * b0 + a1 * b1 - r2m * a2 * b2
    qy = a0 * cc0 + a1 * cc1 - r2m * a2 * cc2

    inf = jnp.float32(jnp.inf)
    m = jnp.minimum(jnp.minimum(Q(x0, y0), Q(x0, y1)),
                    jnp.minimum(Q(x1, y0), Q(x1, y1)))
    # vertical edges x = x0 / x1: 1-D vertex in y when qyy > 0
    safe_yy = jnp.where(qyy > 0, qyy, 1.0)
    for xe in (x0, x1):
        yv = jnp.clip(-(qxy * xe + qy) / safe_yy, y0, y1)
        m = jnp.minimum(m, jnp.where(qyy > 0, Q(xe, yv), inf))
    # horizontal edges y = y0 / y1: 1-D vertex in x when qxx > 0
    safe_xx = jnp.where(qxx > 0, qxx, 1.0)
    for ye in (y0, y1):
        xv = jnp.clip(-(qxy * ye + qx) / safe_xx, x0, x1)
        m = jnp.minimum(m, jnp.where(qxx > 0, Q(xv, ye), inf))
    # clamped filter-center as an extra candidate: the edge/interior
    # vertex LOCATIONS come from expanded coefficients that cancel
    # catastrophically for near-edge-on splats; a badly-located vertex
    # inflates the evaluated min (anti-conservative for a cull). The
    # center is where alpha peaks, so its exact FMA-form value guards
    # the common near-center-positive case at 2 clamps + one Q eval.
    m = jnp.minimum(m, Q(jnp.clip(cx, x0, x1), jnp.clip(cy, y0, y1)))
    # interior critical point when the Hessian is SPD
    det = qxx * qyy - qxy * qxy
    spd = (qxx > 0) & (det > 0)
    safe_det = jnp.where(spd, det, 1.0)
    xi = (qxy * qy - qyy * qx) / safe_det
    yi = (qxy * qx - qxx * qy) / safe_det
    inside = (xi >= x0) & (xi <= x1) & (yi >= y0) & (yi <= y1)
    m = jnp.minimum(m, jnp.where(spd & inside, Q(xi, yi), inf))
    keep3d = m <= 0.0

    dx = jnp.clip(cx, x0, x1) - cx
    dy = jnp.clip(cy, y0, y1) - cy
    keep2d = FILTER_INV_SQUARE * (dx * dx + dy * dy) <= r2m

    bad = ~jnp.isfinite(a0 + a1 + a2 + b0 + b1 + b2 + cc0 + cc1 + cc2)
    return keep3d | keep2d | bad


def bin_gaussians(center2d: jnp.ndarray, extent: jnp.ndarray,
                  depth: jnp.ndarray, visible: jnp.ndarray,
                  width: int, height: int,
                  pairs_capacity: int, chunk: int,
                  cull_abc: tuple = None,
                  rho2max: jnp.ndarray = None,
                  final_capacity: int = None) -> BinningOut:
    """Bin Gaussians into per-tile depth-ordered slot lists.

    When ``cull_abc=(A, B, C)``/``rho2max`` (from preprocess) are given,
    every expanded
    (gaussian, tile) pair is tested EXACTLY against the kernels' per-pixel
    contribution condition — min over the tile's pixel rect of the
    quadratic Q (perspective falloff) and of the low-pass screen distance
    — and non-contributing pairs are dropped before slot assignment. The
    final slot arrays may then be allocated tighter via ``final_capacity``
    (expansion bookkeeping stays at ``pairs_capacity``).
    """
    N = center2d.shape[0]
    ntx = cdiv(width, TILE_W)
    nty = cdiv(height, TILE_H)
    T = ntx * nty
    P_fin = alloc_size(final_capacity or pairs_capacity)
    if P_fin % chunk:
        # the kernels DMA whole chunk-sized row blocks from [start,
        # start+chunk); a non-aligned allocation lets the overflow clamp
        # hand a partially-out-of-range chunk to the DMA engine
        raise ValueError(
            f"final slot capacity {P_fin} must be a multiple of the "
            f"kernel chunk {chunk}")
    if pairs_capacity > MAX_PAIRS_CAPACITY or N > MAX_GAUSSIANS:
        raise ValueError("exact pair bookkeeping requires pairs_capacity "
                         "<= 2^25 and N <= 2^24 "
                         "(growth paths must clamp to MAX_PAIRS_CAPACITY)")
    if pairs_capacity % _GB:
        raise ValueError(
            f"pairs_capacity must be a multiple of {_GB} (the blocked "
            "attribute-gather lane width)")

    depth_key = jnp.where(visible, depth, jnp.inf)
    g_order = jnp.argsort(depth_key, stable=True)          # (N,) front→back

    # Tile rects elementwise in ORIGINAL order, then ONE packed row-gather
    # into depth order (several separate 1-D gathers cost ~1 ms each on
    # v5e; a multi-column row gather is nearly free). All columns ride one
    # f32 table — exact for the integer fields since everything < 2^24.
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
    counts0 = jnp.where(visible, rw0 * rh0, 0)
    f32 = jnp.float32
    cols = [counts0.astype(f32), rw0.astype(f32), tx0.astype(f32),
            ty0.astype(f32)]
    if cull_abc is not None:
        A, B, C = (jax.lax.stop_gradient(x) for x in cull_abc)
        cols += [A[:, i] for i in range(3)]
        cols += [B[:, i] for i in range(3)]
        cols += [C[:, i] for i in range(3)]
        cols += [cx0, cy0,
                 jax.lax.stop_gradient(jnp.asarray(rho2max, f32))]
    rtab = jnp.stack(cols, axis=1)[g_order]                # (N, 4|16)
    counts = rtab[:, 0].astype(jnp.int32)
    rw = rtab[:, 1].astype(jnp.int32)

    cum = jnp.cumsum(counts)                               # inclusive
    total = cum[-1]
    # int32 cumsum wraps when raw demand exceeds 2^31 (possible early in
    # training: millions of unconverged splats x thousands of tiles) —
    # a wrapped-negative total makes pair_valid all-False AND the
    # overflow flag False, so training would silently optimize against
    # an empty render. A f32 sum cannot wrap; its rounding (~2^-24
    # relative) is irrelevant at threshold scale.
    demand_f = jnp.sum(counts.astype(jnp.float32))

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

    # ONE packed row-gather for all per-slot Gaussian attributes (the row
    # width is nearly free — the per-row cost is access-granularity bound).
    # The start slot can exceed 2^24 (capacity up to 2^25), so it rides
    # the f32 table as an exact base-4096 (hi, lo) pair (exact int shift:
    # the divisor is a static power of two — the slow case is int div by
    # a RUNTIME divisor).
    start_hi = jax.lax.shift_right_logical(starts, 12)
    start_lo = starts - start_hi * _START_BASE
    gtab = jnp.concatenate(
        [start_hi.astype(f32)[:, None], start_lo.astype(f32)[:, None],
         rtab[:, 1:], g_order.astype(f32)[:, None]], axis=1)  # (N, 6|18)
    # The gather lands BLOCKED — (P/128, F, 128) — so only the exact
    # storage materializes. A row-major (P, F) f32 intermediate would be
    # lane-padded to (P, 128) by the TPU tiled layout: 7-43x footprint,
    # a 17-34 GB OOM at capacity 2^25 (the gather + reshape + transpose
    # fuse into one blocked-output kernel; same trick as the kernels'
    # chunk-blocked entry wire, api._block_entries).
    F = gtab.shape[1]
    grec = gtab[gidx_c].reshape(-1, _GB, F).transpose(0, 2, 1)  # (P/GB,F,GB)
    col = lambda c: grec[:, c, :]                          # (P/GB, GB)
    slots_b = slots.reshape(-1, _GB)
    g_start = (col(0).astype(jnp.int32) * _START_BASE
               + col(1).astype(jnp.int32))
    k = slots_b - g_start
    w_i = jnp.maximum(col(2).astype(jnp.int32), 1)
    dty = _div_floor_f32(k, w_i)
    dtx = k - dty * w_i
    pair_valid = slots_b < total
    g_tx0 = col(3).astype(jnp.int32)
    g_ty0 = col(4).astype(jnp.int32)
    tile = (g_ty0 + dty) * ntx + (g_tx0 + dtx)
    pair_gid = col(F - 1).astype(jnp.int32)

    if cull_abc is not None:
        pair_valid &= _pair_contributes(
            col, g_tx0 + dtx, g_ty0 + dty, width, height)
    tile_key = jnp.where(pair_valid, tile, T).astype(jnp.int32)
    tile_key = tile_key.reshape(-1)
    pair_gid = pair_gid.reshape(-1)
    pv_flat = pair_valid.reshape(-1)

    # COMPACT gradient coordinates: the backward's per-pair gather and
    # segment sum run over the CULLED expansion order (survivors packed
    # densely, still grouped per depth-sorted Gaussian — dropping pairs
    # inside a contiguous segment keeps it contiguous). Sizing those
    # stages by final_capacity instead of pairs_capacity cuts them ~2x
    # at trained scale, where the bbox expansion over-covers the true
    # conic support.
    valid_cum = jnp.cumsum(pv_flat.astype(jnp.int32))      # inclusive
    compact_dst = jnp.where(pv_flat, valid_cum - 1, P_fin)
    compact_dst = jnp.minimum(compact_dst, P_fin)          # overflow-safe

    # Stable sort by tile key; depth order is preserved within each tile.
    # The third operand carries each entry's compact gradient position so
    # the slot permutation can be inverted into compact coordinates.
    key_sorted, gid_sorted, c_sorted = jax.lax.sort(
        (tile_key, pair_gid, compact_dst), num_keys=1, is_stable=True)

    # Per-tile true counts and CHUNK-aligned starts.
    tiles = jnp.arange(T, dtype=jnp.int32)
    left = jnp.searchsorted(key_sorted, tiles, side="left").astype(jnp.int32)
    right = jnp.searchsorted(key_sorted, tiles, side="right").astype(jnp.int32)
    tile_count = right - left
    num_pairs = right[-1]                           # post-cull survivors
    padded = cdiv(tile_count, chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    padded_total = aligned_start[-1] + padded[-1]   # chunk-padded slot need
    overflow = ((padded_total > P_fin) | (total > pairs_capacity)
                | (demand_f > jnp.float32(pairs_capacity)))
    # Clamp so every tile's padded range fits inside the allocation.
    avail = jnp.maximum(P_fin - aligned_start, 0)
    tile_count = jnp.minimum(tile_count, avail)

    # Route each sorted entry to its aligned slot with pure scans over
    # the sorted keys — NO per-slot gather of tile attributes (the old
    # (P, 3) s32 row-gather materialized lane-padded to (P, 128): 16 GB
    # at capacity 2^25). Segments of equal key are contiguous, so:
    #   rank within tile  = pos − (cummax of segment-start positions)
    #   aligned start     = running sum, at each segment start, of the
    #                       PREVIOUS segment's chunk-padded size
    # which reproduces aligned_start[key] exactly (empty tiles pad 0).
    pos = slots
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    left_pp = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = pos - left_pp
    prev_left = jnp.concatenate([jnp.zeros((1,), jnp.int32), left_pp[:-1]])
    count_prev = pos - prev_left          # at a start: previous segment size
    pad_prev = cdiv(count_prev, chunk) * chunk
    contrib = jnp.where(is_start & (pos > 0), pad_prev, 0)
    astart_pp = jnp.cumsum(contrib).astype(jnp.int32)   # own segment's start
    new_slot = astart_pp + rank
    # rank < tile_count is automatic (rank < segment size); the avail
    # clamp of tile_count is equivalent to new_slot < P_fin.
    entry_ok = (key_sorted < T) & (new_slot < P_fin)
    new_slot = jnp.where(entry_ok, new_slot, P_fin)  # dropped if out of range

    # One fused scatter: store gid+1 so empty slots read 0 ⇒ invalid.
    gid1 = jnp.zeros((P_fin,), jnp.int32).at[new_slot].set(
        gid_sorted + 1, mode="drop")
    slot_valid = gid1 > 0
    gid = jnp.maximum(gid1 - 1, 0)

    # compact culled-pair index → final slot (clamp-dropped entries map
    # to P_fin; compact positions beyond P_fin — overflow only — drop)
    inv = jnp.full((P_fin,), P_fin, jnp.int32).at[c_sorted].set(
        new_slot, mode="drop")
    # per-Gaussian segment bounds in compact coordinates: exclusive
    # prefix of the validity count at each expansion boundary
    excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), valid_cum])
    seg_start = jnp.minimum(excl[jnp.minimum(starts, pairs_capacity)], P_fin)
    seg_end = jnp.minimum(excl[jnp.minimum(cum, pairs_capacity)], P_fin)

    return BinningOut(
        gid=gid, slot_valid=slot_valid,
        tile_start=aligned_start, tile_count=tile_count,
        num_pairs=num_pairs, padded_total=padded_total, overflow=overflow,
        inv=inv, seg_start=seg_start, seg_end=seg_end,
        order=g_order.astype(jnp.int32),
        num_expanded=total,
    )


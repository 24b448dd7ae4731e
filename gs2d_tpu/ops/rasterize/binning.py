"""Tile binning (pure jnp, non-differentiable).

Replaces the reference CUDA duplicate+radix-sort binning (SURVEY.md §2.1
step 2) with a TPU-friendly fixed-capacity pipeline:

1. stable argsort of Gaussians by view depth (culled → +inf, pushed last);
2. per-Gaussian tile rectangles + conic constants from the dual-conic
   screen extents;
3. TWO-LEVEL expansion into a static-capacity slot array (no dynamic
   shapes): Gaussians → (gaussian, tile-ROW) pairs, each row carrying a
   conservative x-interval of the splat's support (the widest conic
   chord over the row's y-strip, inflated so f32 slop only ADDS tiles)
   — then rows → (gaussian, tile) pairs. Expanding intervals instead of
   full bbox rows cuts pair demand ~6x at trained 1080p scale (26.7M
   bbox pairs vs ~4.3M contributing at 1M splats). The intervals are
   computed in N-SPACE as packed (N, K_ENT) tables of strided strip
   entries (entry k covers tile rows [k*s, (k+1)*s), s = ceil(rh/K) —
   per-row exact for the common rh <= K splat, graceful strips for the
   big-splat tail that dominates pair demand), so entry space
   forward-fills only TWO columns (ty0, gid) and gathers the packed
   count/decode values in two shots (every 1-D scatter costs ~9 ns per
   update on v5e; the former design scattered 14 attribute columns).
   Level 1 lives in a ROWS_CAPACITY-sized space (its own, smaller knob,
   sized to true demand). Ownership rides scatter + running-max scans —
   the segment-start flag is DERIVED from the cummax (start ==
   position), not scattered; the remaining entry attributes ride a
   forward-fill associative scan (gather-free: any capacity-sized
   row-major gather operand would lane-pad to 128, a 16 GB OOM);
4. ONE stable sort on the tile key over the expansion space — entries
   arrive depth-ordered, so the stable sort leaves every tile's list
   depth-ordered (the CUDA 64-bit (tile|depth) radix sort collapses to
   a single 32-bit key sort; measured ~14 ms for 3 operands at 5.5M on
   v5e — the sort is NOT the expensive part, the scatters around it
   are, so there is no pre-sort compaction pass);
5. per-tile ranges with CHUNK-aligned starts, so the Pallas kernels can DMA
   whole chunks without ever touching a neighboring tile's slots (TPU has
   no atomics and no masked DMA — alignment replaces both). Tile range
   lookups use a hand-rolled vectorized binary search (T=#tiles queries)
   — jnp.searchsorted lowers to full-capacity SORTS on TPU (~8-10 ms
   each; the whole trace showed ~70 ms of them).

Performance notes (measured on v5e, op-level trace at 1M splats/1080p):
XLA lowers every 1-D scatter to sort(updates) + a SERIAL apply pass
(~5.6 cycles per update — cost scales with update count); 1-D gathers
pay ~7 ns per query; jnp.cumsum / lax.cummax lower to a strided-slice
cascade costing ~30-45 ms per multi-million-element scan (replaced here
by _iscan, a blocked Hillis-Steele at streaming bandwidth); lax.sort is
~4-5 ms per operand at 5.6M and is the CHEAPEST way to move data along
a permutation (see the `inv` inversion-by-second-sort). The design
rules that follow: size every bookkeeping array to its true demand
(entries vs pairs), never scatter what a scan can derive (segment flags
from cummax), keep update counts minimal, and prefer sorts over
scatters for permutation moves. ROW gathers of multi-column records pay
~20-22 ns/row regardless of width AND lane-pad their operands to 128.

Everything here is integer bookkeeping wrapped in stop_gradient by callers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import FILTER_INV_SQUARE, TILE_H, TILE_W, cdiv

# Pair-capacity ceiling. Bookkeeping is int32 (exact to 2^31) or
# scatter/scan-reconstructed, so 2^25 (33.5M) is simply the HBM budget
# line for the capacity-sized streams. Gaussian COUNT N stays ≤ 2^24
# (its ids ride single f32 columns through the forward-fill).
MAX_PAIRS_CAPACITY = 1 << 25
MAX_GAUSSIANS = 1 << 24
_GB = 128           # lane width of the forward-fill blocking
# Per-Gaussian interval tables carry K_ENT strided entries: entry k of a
# splat with rh tile rows covers rows [k*s, (k+1)*s) with s = ceil(rh/K)
# and ONE conservative x-interval (the widest conic chord over the whole
# multi-row strip). Splats with rh <= K get exact per-row intervals
# (s = 1, the common case: mean tile-row count at trained 1080p scale is
# ~2.4); taller splats get K strips whose union over-covers their
# support by only ~s/rh — crucially NOT the full bbox (pair demand is
# dominated by the big-splat tail: a bbox fallback for rh > K re-inflated
# demand 5x at the 1M-splat probe).
K_ENT = 16
# Level-2 decode pack (int32): entry value = ty_off*2^20 + jx0*2^10 + w.
_DEC_W_BITS = 10     # strip x-interval width in tiles   (ntx <= 1023)
_DEC_X_BITS = 10     # interval start tile x             (ntx <= 1023)
_DEC_W_BASE = 1 << _DEC_W_BITS
_DEC_X_BASE = 1 << _DEC_X_BITS
_DEC_TY_MAX = (1 << (31 - _DEC_W_BITS - _DEC_X_BITS)) - 1   # nty <= 2047


class BinningOut(NamedTuple):
    gid: jnp.ndarray         # (P_fin,) int32 gaussian id per slot (0 if pad)
    slot_valid: jnp.ndarray  # (P_fin,) bool — real entry occupies slot
    tile_start: jnp.ndarray  # (T,) int32 CHUNK-aligned start slot per tile
    tile_count: jnp.ndarray  # (T,) int32 true entry count per tile
    num_pairs: jnp.ndarray   # () int32 surviving pairs (post-cull, pre-clamp)
    padded_total: jnp.ndarray  # () int32 chunk-padded slot need (true demand)
    overflow: jnp.ndarray    # () bool — capacity exceeded, tails dropped
    # Gradient-reduction side tables in EXPANSION coordinates (pairs
    # grouped contiguously per depth-sorted Gaussian): expansion pair →
    # binned slot. The gather VJP reduces per-Gaussian gradients with
    # contiguous segment sums instead of a scatter-add (which collapses
    # to ~0.3 G adds/s once the accumulator exceeds VMEM). The interval
    # expansion is tight enough (~1.1x the kept pairs) that a separate
    # compacted coordinate system stopped paying for its two extra
    # capacity-sized scatters (~9 ns/slot each on v5e).
    inv: jnp.ndarray          # (pairs_capacity,) int32 expansion pair → slot
                              #   (P_fin if dropped/invalid)
    seg_start: jnp.ndarray    # (N,) int32 expansion segment start, clamped,
                              #   in ORIGINAL gaussian order
    seg_end: jnp.ndarray      # (N,) int32 expansion segment end, clamped,
                              #   in ORIGINAL gaussian order
    # Depth-order duals: segments are CONTIGUOUS in depth order
    # (start_i = end_{i-1}), so the backward's prefix-difference segment
    # sum needs only the END endpoints there — 2 capacity-sized row
    # gathers instead of 4 — plus one (N, C) reorder through inv_order
    # (net: 3N row-moves for 4N, and no gstart scatter on the hot path).
    seg_end_d: jnp.ndarray    # (N,) int32 expansion segment end, clamped,
                              #   in DEPTH order (inclusive prefix of cntg)
    inv_order: jnp.ndarray    # (N,) int32 original Gaussian id → depth rank
    order: jnp.ndarray        # (N,) int32 depth-sorted → original Gaussian id
    num_expanded: jnp.ndarray  # () int32 expansion pair demand
    num_rows: jnp.ndarray     # () int32 level-1 strip-entry demand


def alloc_size(pairs_capacity: int) -> int:
    """Slot-array allocation = exactly the capacity: it bounds the
    CHUNK-padded slot total (real pairs + per-tile alignment padding),
    and the caller's overflow-growth loop (train/loop.py) absorbs scenes
    that exceed it. Keeping every capacity-proportional cost (sort,
    scatter, expansion gather, the kernels' d_entries) tied to ONE knob
    roughly halves the binning+gather cost vs worst-case headroom."""
    return pairs_capacity


def _iscan(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Inclusive 1-D scan (kind = "sum" | "max") at streaming bandwidth.

    XLA's native cumsum/cummax lowers to a logarithmic strided-slice
    cascade that measured ~30-45 ms PER SCAN at 2-6M elements on v5e
    (the dominant cost in the binning trace). This 128-lane
    Hillis-Steele with a recursive block-carry level moves ~7x the
    array per level and runs in ~1-2 ms. Integer sums are exact
    (associative); max is order-free."""
    n = x.shape[0]
    if n <= 8192:
        return jnp.cumsum(x) if kind == "sum" else jax.lax.cummax(x)
    if kind == "sum":
        ident = jnp.zeros((), x.dtype)
        op = jnp.add
    else:
        ident = (jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype,
                                                          jnp.integer)
                 else -jnp.inf)
        ident = jnp.asarray(ident, x.dtype)
        op = jnp.maximum
    pad = (-n) % _GB
    xp = jnp.concatenate([x, jnp.full((pad,), ident, x.dtype)]) if pad else x
    xb = xp.reshape(-1, _GB)
    s = 1
    while s < _GB:
        sh = jnp.pad(xb, ((0, 0), (s, 0)),
                     constant_values=ident)[:, :_GB]
        xb = op(xb, sh)
        s *= 2
    carry = _iscan(xb[:, -1], kind)              # inclusive block totals
    prev = jnp.concatenate([ident[None], carry[:-1]])
    xb = op(xb, prev[:, None])
    return xb.reshape(-1)[:n]


def _ffill_k(flag: jnp.ndarray, *vals: jnp.ndarray):
    """Segmented forward-fill of K value arrays along slots: each slot
    takes its values from the nearest flagged slot at-or-before it.

    Hand-rolled Hillis–Steele on the (flag, values) fill monoid:
    log-shift passes inside 128-lane blocks, a tiny cross-block carry
    fill, then one carry application — all plain elementwise ops. (The
    obvious jax.lax.associative_scan over an operand tuple at 2^22+
    slots never finished the TPU AOT compile — >1 h, r3 — while
    compiling to the same work on CPU. Capacity-sized row GATHERS are
    no alternative either: ~20 ns per row on v5e regardless of width,
    and their row-major operands lane-pad to 128.)"""
    P = flag.shape[0]
    Bn = P // _GB
    f = flag.reshape(Bn, _GB)
    vs = [v.reshape(Bn, _GB) for v in vals]
    s = 1
    while s < _GB:
        fs = jnp.pad(f, ((0, 0), (s, 0)))[:, :_GB]
        take = ~f & fs
        vs = [jnp.where(take, jnp.pad(v, ((0, 0), (s, 0)))[:, :_GB], v)
              for v in vs]
        f = f | fs
        s *= 2
    # cross-block carries: the filled last lane of each block, forward-
    # filled over blocks (Bn-sized — negligible), applied shifted by one
    cf = f[:, -1]
    cs = [v[:, -1] for v in vs]
    s = 1
    while s < Bn:
        cfs = jnp.pad(cf, (s, 0))[:Bn]
        take = ~cf & cfs
        cs = [jnp.where(take, jnp.pad(c, (s, 0))[:Bn], c) for c in cs]
        cf = cf | cfs
        s *= 2
    pf = jnp.pad(cf, (1, 0))[:Bn][:, None]
    take = ~f & pf
    vs = [jnp.where(take, jnp.pad(c, (1, 0))[:Bn][:, None], v)
          for v, c in zip(vs, cs)]
    return [v.reshape(-1) for v in vs]



def _bsearch_i32(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                 side: str) -> jnp.ndarray:
    """Vectorized binary search: first index where sorted_keys[i] >= q
    (side="left") / > q (side="right"). jnp.searchsorted lowers to
    full-array SORTS on TPU (~8-10 ms each at 5.5M); with few queries
    (#tiles) this loop of ~23 tiny gathers runs in ~1 ms."""
    n = sorted_keys.shape[0]
    steps = max(1, (n - 1).bit_length()) if n > 1 else 1
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) >> 1
        kv = sorted_keys[jnp.minimum(mid, n - 1)]
        go_right = (kv < queries) if side == "left" else (kv <= queries)
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def _pair_contributes(col, tx: jnp.ndarray, ty: jnp.ndarray,
                      width: int, height: int) -> jnp.ndarray:
    """Exact contribution test of pair (gaussian, tile) against the
    kernels' per-pixel condition (kernel_common.chunk_geometry):
    a pixel composites iff min(rho3d, rho2d) <= rho2max, with
    rho3d = (P0^2+P1^2)/P2^2 and rho2d the low-pass screen distance.

    Not on the production path since the row-interval expansion replaced
    the per-pair cull (bin_gaussians level 1): it is the independent
    oracle that tests use to prove the conservative per-row intervals
    never drop a contributing tile (tests/test_cull.py).

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
                  final_capacity: int = None,
                  rows_capacity: int = None) -> BinningOut:
    """Bin Gaussians into per-tile depth-ordered slot lists.

    When ``cull_abc=(A, B, C)``/``rho2max`` (from preprocess) are given,
    each Gaussian expands only the tiles inside a conservative
    per-strip-entry x-interval of its support (widest conic chord over
    the strip's y-range plus the low-pass filter chord, inflated so f32
    slop can only add tiles — tests/test_cull.py proves the superset
    property against the exact per-tile oracle ``_pair_contributes``).
    Without them every entry expands its full bbox width. The final
    slot arrays may be allocated tighter via ``final_capacity``
    (expansion bookkeeping stays at ``pairs_capacity``).
    ``rows_capacity`` sizes the level-1 (gaussian, strip-entry) space —
    typically much smaller than the pair space; every scatter into it
    costs ~9 ns per slot on v5e, so callers should probe-size it
    (suggest_capacities).
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
    R_cap = rows_capacity or pairs_capacity
    if pairs_capacity % _GB or R_cap % _GB:
        raise ValueError(
            f"pairs/rows capacities must be multiples of {_GB} (the "
            "blocked forward-fill lane width)")
    if R_cap > MAX_PAIRS_CAPACITY:
        raise ValueError("rows_capacity exceeds the bookkeeping ceiling")

    depth_key = jnp.where(visible, depth, jnp.inf)
    g_order = jnp.argsort(depth_key, stable=True)          # (N,) front→back

    # Tile rects + per-Gaussian interval constants elementwise in
    # ORIGINAL order, then ONE packed row-gather into depth order
    # (several separate 1-D gathers cost ~1 ms each on v5e; a
    # multi-column row gather is nearly free). All columns ride one f32
    # table — exact for the integer fields since everything < 2^24.
    cx0, cy0 = center2d[:, 0], center2d[:, 1]
    ex0, ey0 = extent[:, 0], extent[:, 1]
    tx0 = jnp.clip(jnp.floor((cx0 - ex0) / TILE_W).astype(jnp.int32), 0, ntx)
    tx1 = jnp.clip((jnp.floor((cx0 + ex0) / TILE_W) + 1).astype(jnp.int32),
                   0, ntx)
    ty0 = jnp.clip(jnp.floor((cy0 - ey0) / TILE_H).astype(jnp.int32), 0, nty)
    ty1 = jnp.clip((jnp.floor((cy0 + ey0) / TILE_H) + 1).astype(jnp.int32),
                   0, nty)
    rh0 = jnp.maximum(ty1 - ty0, 0)
    if ntx >= _DEC_X_BASE or nty > _DEC_TY_MAX:
        raise ValueError(
            f"tile grid {ntx}x{nty} exceeds the int32 decode pack "
            f"(ntx < {_DEC_X_BASE}, nty <= {_DEC_TY_MAX})")
    f32 = jnp.float32
    # LEVEL-1 expands ENTRIES: ceil(rh/s) strided strips of s tile rows.
    # All (K, N)-shaped tables put N on the LANE axis: a (N, K=16) layout
    # lane-pads 16 → 128 and every materialized intermediate moves 8x its
    # real bytes (measured ~35 ms of the binning wall at 1M splats).
    ks = jnp.arange(K_ENT, dtype=jnp.int32)[:, None]          # (K, 1)
    s0 = (rh0 + (K_ENT - 1)) // K_ENT                         # stride, >=1
    s0 = jnp.maximum(s0, 1)
    nE0 = (rh0 + s0 - 1) // s0                                # entries <= K
    counts0 = jnp.where(visible, nE0, 0)
    ty_off = ks * s0[None, :]                                 # (K, N)
    nr = jnp.clip(rh0[None, :] - ty_off, 0, s0[None, :])      # rows/entry
    if cull_abc is not None:
        # Per-Gaussian conic constants in CENTERED screen coordinates
        # (u, v) = (x - cx, y - cy): the splat's per-pixel falloff test
        # (kernel_common.chunk_geometry) composites iff
        # Q = P0^2 + P1^2 - rho2max*P2^2 <= 0 with P = A + B x + C y, or
        # the low-pass screen distance passes. Centering kills the
        # catastrophic linear-term cancellation of the expanded conic
        # (qx = a.b with a ~ -b*cx); the remaining second-order
        # cancellation (quu = |Bxy|^2 - r2m*b2^2) is gated by cond below.
        A, B, C = (jax.lax.stop_gradient(x) for x in cull_abc)
        r2m = jax.lax.stop_gradient(jnp.asarray(rho2max, f32))
        b0, b1, b2 = B[:, 0], B[:, 1], B[:, 2]
        e0, e1, e2 = C[:, 0], C[:, 1], C[:, 2]
        p0 = A[:, 0] + b0 * cx0 + e0 * cy0
        p1 = A[:, 1] + b1 * cx0 + e1 * cy0
        p2 = A[:, 2] + b2 * cx0 + e2 * cy0
        quu = b0 * b0 + b1 * b1 - r2m * b2 * b2
        qvv = e0 * e0 + e1 * e1 - r2m * e2 * e2
        quv = b0 * e0 + b1 * e1 - r2m * b2 * e2
        gu = p0 * b0 + p1 * b1 - r2m * p2 * b2
        gv = p0 * e0 + p1 * e1 - r2m * p2 * e2
        qc = p0 * p0 + p1 * p1 - r2m * p2 * p2
        # chord(v): quu u^2 + 2(quv v + gu) u + (qvv v^2 + 2 gv v + qc)
        # <= 0; its discriminant in v is alf v^2 + 2 bet v + gam,
        # CONCAVE for an ellipse (alf < 0) — so the widest chord over a
        # row strip is at the clamped vertex, one closed form per row.
        alf = quv * quv - quu * qvv
        bet = quv * gu - quu * gv
        gam = gu * gu - quu * qc
        mag_uu = b0 * b0 + b1 * b1 + r2m * b2 * b2
        finite_all = jnp.isfinite(quu + quv + gu + alf + bet + gam
                                  + cx0 + cy0 + r2m)
        # Conditioning gate on quu only (the chord denominator): its
        # relative error is ~eps*mag_uu/quu, absorbed by the adaptive
        # margin factor below. No ellipse-ness gate — for alf >= 0 the
        # discriminant is convex in v, so its strip max sits at the
        # endpoints and the chord bound stays conservative (gating on
        # alf dumped every extreme-aspect sliver to full bbox rows:
        # 0.3% of splats carrying 7.0M of 11.5M pairs at the 1M-splat
        # 1080p operating point). Ill-conditioned / non-finite splats
        # fall back to the full bbox row (margf <= 0 sentinel).
        cond = (quu > 1e-4 * mag_uu) & finite_all
        margf = jnp.where(
            cond, 1e-3 + 64.0 * 1.2e-7 * mag_uu / jnp.where(cond, quu, 1.0),
            -1.0)

        # ---- (K_ENT, N) interval tables, built in N-SPACE -------------
        # Conservative x-interval of the splat's support per strided
        # strip (entry k covers tile rows [k*s, k*s+nr)). Moving this
        # from row space to N-space turns 10 interval-constant scatters
        # + forward-fills (each ~9 ns per update on v5e) into pure
        # elementwise math plus TWO packed-table gathers in entry space.
        #
        # The strip is its rows' pixel-center y-range in centered
        # coords; the conic interval is [min chord center - widest half,
        # max + widest half] (chord centers are linear in v, the
        # discriminant concave), the low-pass filter contributes an
        # exact circle chord; both are inflated (absolute eps on the
        # discriminant + 2 px margins) so f32 slop can only ADD tiles,
        # never drop a contributing one. The kernels' per-pixel test
        # remains the exact arbiter.
        ya = ((ty0[None, :] + ty_off) * TILE_H).astype(f32)
        yb = jnp.minimum(ya + (nr * TILE_H - 1).astype(f32), height - 1.0)
        va = ya - cy0[None, :]
        vb = yb - cy0[None, :]
        alf_b, bet_b, gam_b = alf[None, :], bet[None, :], gam[None, :]

        def _disc(v):
            # absolute inflation ~1000x f32 eps of the evaluation
            # magnitudes: rounding can only widen the chord, never drop
            # a contributing tile
            d = (alf_b * v + 2.0 * bet_b) * v + gam_b
            return d + 1e-4 * (jnp.abs(alf_b) * v * v
                               + 2.0 * jnp.abs(bet_b) * jnp.abs(v)
                               + jnp.abs(gam_b))

        # strip max of the concave/convex discriminant: endpoints
        # always, plus the clamped vertex when concave (alf < 0, the
        # elliptic case)
        alf_safe = jnp.where(alf < 0.0, alf, -1.0)[None, :]
        vhat = jnp.clip(-bet_b / alf_safe, va, vb)
        disc = jnp.maximum(jnp.maximum(_disc(va), _disc(vb)),
                           jnp.where(alf_b < 0.0, _disc(vhat), -jnp.inf))
        cne = cond[None, :] & (disc >= 0.0)
        quu_safe = jnp.where(cond, quu, 1.0)[None, :]
        half = jnp.sqrt(jnp.maximum(disc, 0.0)) / quu_safe
        ca = -(quv[None, :] * va + gu[None, :]) / quu_safe
        cb = -(quv[None, :] * vb + gu[None, :]) / quu_safe
        ulo_c = jnp.minimum(ca, cb) - half
        uhi_c = jnp.maximum(ca, cb) + half
        marg = margf[None, :] * (jnp.abs(ulo_c) + jnp.abs(uhi_c)) + 2.0
        ulo_c, uhi_c = ulo_c - marg, uhi_c + marg
        rf2 = (r2m * (1.0 / FILTER_INV_SQUARE))[None, :]
        dyf = jnp.maximum(jnp.maximum(va, -vb), 0.0)
        fne = cond[None, :] & (dyf * dyf <= rf2)
        fhalf = jnp.sqrt(jnp.maximum(rf2 - dyf * dyf, 0.0)) + 1.0
        big = jnp.float32(1e9)
        ulo = jnp.minimum(jnp.where(cne, ulo_c, big),
                          jnp.where(fne, -fhalf, big))
        uhi = jnp.maximum(jnp.where(cne, uhi_c, -big),
                          jnp.where(fne, fhalf, -big))
        jx0k = jnp.clip(
            jnp.floor((cx0[None, :] + ulo) / TILE_W).astype(jnp.int32),
            tx0[None, :], tx1[None, :])
        jx1k = jnp.clip(
            jnp.floor((cx0[None, :] + uhi) / TILE_W).astype(jnp.int32) + 1,
            jx0k, tx1[None, :])
        jx0k = jnp.where(cond[None, :], jx0k, tx0[None, :])  # fallbacks:
        jx1k = jnp.where(cond[None, :], jx1k, tx1[None, :])  # bbox width
    else:
        jx0k = jnp.broadcast_to(tx0[None, :], (K_ENT, N))
        jx1k = jnp.broadcast_to(tx1[None, :], (K_ENT, N))
    live = nr > 0
    wk = jnp.where(live, jx1k - jx0k, 0)                  # tiles/entry
    # Two int32 entry tables: pair count per entry, and the level-2
    # decode pack (strip FIRST TILE ROW — absolute, ty0 baked in here so
    # entry space needs no ty0 column at all — interval start, width).
    # (K, N) k-major flattening: entry k of gaussian g sits at k*N + g.
    tab_cnt = (nr * wk).astype(jnp.int32).reshape(-1)     # (K*N,)
    tab_dec = ((((ty0[None, :] + ty_off) << (_DEC_X_BITS + _DEC_W_BITS))
                + (jnp.where(live, jx0k, 0) << _DEC_W_BITS)
                + wk).astype(jnp.int32).reshape(-1))      # (K*N,)

    # Per-Gaussian pair count, in N-space. EXACTLY equals the sum of the
    # entry-space per-entry counts (both read the same table), so the
    # gradient segment bounds below can ride a plain cumsum instead of
    # two R-sized gathers of the level-2 prefix.
    cntg = jnp.where(visible, jnp.sum(nr * wk, axis=0), 0)

    counts = counts0[g_order]                   # entries per gaussian

    cumR = _iscan(counts, "sum")                           # inclusive
    totalR = cumR[-1]            # rows <= N*nty < 2^31: cannot wrap
    demand_rows_f = jnp.sum(counts.astype(f32))

    # ---- level 1: expand Gaussians into (gaussian, tile-row) pairs ----
    # Gather-free: each Gaussian's attributes are SCATTERED at its row-
    # range start and forward-filled along row slots (rows per Gaussian
    # are contiguous). A capacity-sized row gather would cost ~20 ns per
    # row on v5e regardless of width — the forward-fill's ~7 elementwise
    # lane-shift passes move the same data at streaming bandwidth. The
    # row-range start itself forward-fills by cummax (starts monotone).
    pos1 = jnp.arange(R_cap, dtype=jnp.int32)
    starts1 = cumR - counts
    seg_src1 = jnp.where(counts > 0, starts1, R_cap)
    start1_pp = _iscan(
        jnp.zeros((R_cap,), jnp.int32).at[seg_src1].max(
            starts1, mode="drop", unique_indices=True), "max")
    # The segment-start flag is DERIVED, not scattered: a slot is a
    # segment start iff the cummax-filled start equals the position
    # (slot 0 is always a real start when any row exists — starts are
    # monotone from 0 — and the invalid tail compares false). Saves one
    # capacity-sized scatter (~9 ns/slot).
    flag1 = start1_pp == pos1

    def scat1(colv):
        return jnp.zeros((R_cap,), colv.dtype).at[seg_src1].set(
            colv, mode="drop", unique_indices=True)

    # Only ONE attribute column rides the entry-space forward-fill —
    # the Gaussian id; per-entry counts and decode packs come from TWO
    # gathers of the N-space tables (built above). Garbage slots past
    # totalR read a valid id (forward-fill) and mask out via row_ok.
    (gidf,) = _ffill_k(flag1, scat1(g_order.astype(f32)))
    pos1b = pos1.reshape(-1, _GB)
    k1 = pos1b - start1_pp.reshape(-1, _GB)     # entry index within splat
    gidrow = gidf.reshape(-1, _GB).astype(jnp.int32)
    row_ok = pos1b < totalR

    tidx = k1 * N + gidrow              # k1 < nE <= K_ENT for valid slots
    cnt2 = jnp.where(row_ok, tab_cnt[tidx], 0)
    trow = tab_dec[tidx]                # (first tile row, x0, w) pack

    # ---- level 2: expand rows into (gaussian, tile) pairs -------------
    # Gather-free: a per-pair row-gather would need an R-sized row-major
    # operand (lane-padded 16 GB at 2^25). Instead scatter each row's
    # attributes at its pair-range start and forward-fill along slots —
    # the range start by cummax (starts are monotone), (trow, gid) by a
    # 3-operand associative select-scan.
    cnt2f = cnt2.reshape(-1)
    cum2 = _iscan(cnt2f, "sum")
    total2 = cum2[-1]
    # int32 cumsum wraps when raw demand exceeds 2^31 (possible early in
    # training); a f32 sum cannot wrap and guards the overflow flag.
    demand2_f = jnp.sum(cnt2f.astype(f32))
    starts2 = cum2 - cnt2f
    seg_src2 = jnp.where(cnt2f > 0, starts2, pairs_capacity)
    pos2 = jnp.arange(pairs_capacity, dtype=jnp.int32)
    start_pp = _iscan(
        jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].max(
            starts2, mode="drop", unique_indices=True), "max")
    flag0 = start_pp == pos2          # derived, same argument as flag1
    trow0 = jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].set(
        trow.reshape(-1), mode="drop", unique_indices=True)
    gid0 = jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].set(
        gidrow.reshape(-1), mode="drop", unique_indices=True)
    trow_pp, gid_pp = _ffill_k(flag0, trow0, gid0)

    # Decode pair k2 of its entry: pairs are row-major over the entry's
    # (nr rows) x (w tiles) rectangle. k2 < nr*w by construction, so the
    # division bound is never consulted for dead entries.
    k2 = pos2 - start_pp
    w2 = trow_pp & (_DEC_W_BASE - 1)
    x0_2 = jax.lax.shift_right_logical(trow_pp, _DEC_W_BITS) \
        & (_DEC_X_BASE - 1)
    tyb2 = jax.lax.shift_right_logical(trow_pp, _DEC_X_BITS + _DEC_W_BITS)
    r2 = k2 // jnp.maximum(w2, 1)
    jx2 = x0_2 + (k2 - r2 * jnp.maximum(w2, 1))
    ty2 = tyb2 + r2
    tile = ty2 * ntx + jx2
    pair_gid = gid_pp
    pv_flat = pos2 < total2
    tile_key = jnp.where(pv_flat, tile, T).astype(jnp.int32)

    # Stable sort by tile key over the expansion space; depth order is
    # preserved within each tile. (A pre-sort compaction pass used to
    # shrink the sort when the bbox expansion over-covered ~6x; the
    # interval expansion is ~1.1x tight, and the sort itself is ~14 ms
    # at 5.5M on v5e — the compaction's two extra capacity-sized
    # scatters cost more than they saved.) The third operand carries
    # each entry's expansion position so the slot permutation can be
    # inverted for the backward's gradient reorder.
    key_sorted, gid_sorted, p_sorted = jax.lax.sort(
        (tile_key, pair_gid, pos2),
        num_keys=1, is_stable=True)

    # Per-tile true counts and CHUNK-aligned starts. jnp.searchsorted
    # lowers to full-capacity sorts on TPU (~8-10 ms each, 4 in the
    # trace); T=#tiles queries take ~1 ms as a hand-rolled vectorized
    # binary search.
    tiles = jnp.arange(T, dtype=jnp.int32)
    left = _bsearch_i32(key_sorted, tiles, "left")
    right = _bsearch_i32(key_sorted, tiles, "right")
    tile_count = right - left
    num_pairs = right[-1]                           # surviving pairs
    padded = cdiv(tile_count, chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    padded_total = aligned_start[-1] + padded[-1]   # chunk-padded slot need
    # cntg's f32 sum guards int32 cumsum wrap in the N-space pair demand
    # (it counts tail rows past R_cap that demand2_f cannot see).
    demand_pairs_f = jnp.sum(cntg.astype(f32))
    overflow = ((padded_total > P_fin) | (total2 > pairs_capacity)
                | (demand2_f > jnp.float32(pairs_capacity))
                | (demand_pairs_f > jnp.float32(pairs_capacity))
                | (totalR > R_cap)
                | (demand_rows_f > jnp.float32(R_cap)))
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
    pos = pos2
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    left_pp = _iscan(jnp.where(is_start, pos, 0), "max")
    rank = pos - left_pp
    prev_left = jnp.concatenate([jnp.zeros((1,), jnp.int32), left_pp[:-1]])
    count_prev = pos - prev_left          # at a start: previous segment size
    pad_prev = cdiv(count_prev, chunk) * chunk
    contrib = jnp.where(is_start & (pos > 0), pad_prev, 0)
    astart_pp = _iscan(contrib, "sum")                  # own segment's start
    new_slot = astart_pp + rank
    # rank < tile_count is automatic (rank < segment size); the avail
    # clamp of tile_count is equivalent to new_slot < P_fin.
    entry_ok = (key_sorted < T) & (new_slot < P_fin)
    new_slot = jnp.where(entry_ok, new_slot, P_fin)  # dropped if out of range

    # One fused scatter: store gid+1 so empty slots read 0 ⇒ invalid.
    gid1 = jnp.zeros((P_fin,), jnp.int32).at[new_slot].set(
        gid_sorted + 1, mode="drop", unique_indices=True)
    slot_valid = gid1 > 0
    gid = jnp.maximum(gid1 - 1, 0)

    # expansion pair index → final slot (clamp-dropped and invalid
    # entries map to P_fin). p_sorted is a PERMUTATION of the expansion
    # space, so inverting it is a second 2-operand sort — the sorted
    # output IS the array (a scatter would sort the updates anyway and
    # then pay a serial ~5.6-cycles-per-update apply pass, ~43 ms vs
    # ~10 ms at 5.6M on v5e).
    inv = jax.lax.sort((p_sorted, new_slot), num_keys=1)[1]
    # per-Gaussian segment bounds in expansion coordinates, from the
    # N-space per-Gaussian pair counts (EXACTLY the level-2 prefix at
    # each Gaussian's entry block, since both sum the same table widths
    # and entries are contiguous per Gaussian). Emitted in ORIGINAL
    # gaussian order — the backward's segment sums then come out in
    # original order directly, with NO (N, 24) reorder scatter at the
    # end of the glue (measured ~98 ms at 1M on v5e): one extra N-sized
    # scatter here (~9 ms) buys that off.
    cntg_d = cntg[g_order]
    cum_pairs = _iscan(cntg_d, "sum")
    gstart = jnp.zeros((N,), jnp.int32).at[g_order].set(
        (cum_pairs - cntg_d).astype(jnp.int32), mode="drop", unique_indices=True)
    seg_start = jnp.clip(gstart, 0, pairs_capacity)
    seg_end = jnp.clip(gstart + cntg, 0, pairs_capacity)
    # depth-order dual of seg_end + the inverse depth permutation (a
    # second 2-operand sort — cheaper than an N-update scatter, see the
    # `inv` note above). The hot path consumes ONLY these two; the
    # original-order bounds above are diagnostics XLA dead-code-eliminates.
    seg_end_d = jnp.clip(cum_pairs, 0, pairs_capacity).astype(jnp.int32)
    pos_n = jnp.arange(N, dtype=jnp.int32)
    inv_order = jax.lax.sort((g_order.astype(jnp.int32), pos_n),
                             num_keys=1)[1]

    return BinningOut(
        gid=gid, slot_valid=slot_valid,
        tile_start=aligned_start, tile_count=tile_count,
        num_pairs=num_pairs, padded_total=padded_total, overflow=overflow,
        inv=inv, seg_start=seg_start, seg_end=seg_end,
        seg_end_d=seg_end_d, inv_order=inv_order,
        order=g_order.astype(jnp.int32),
        num_expanded=total2,
        num_rows=totalR,
    )

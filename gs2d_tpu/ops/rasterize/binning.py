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
   bbox pairs vs ~4.3M contributing at 1M splats). Ownership rides
   scatter + running-max scans; level-2 row attributes ride a
   forward-fill associative scan (gather-free: any capacity-sized
   row-major gather operand would lane-pad to 128, a 16 GB OOM);
4. survivors are compacted, then ONE stable sort on the tile key —
   entries arrive depth-ordered, so the stable sort leaves every tile's
   list depth-ordered (the CUDA 64-bit (tile|depth) radix sort
   collapses to a single 32-bit key sort at final capacity);
5. per-tile ranges with CHUNK-aligned starts, so the Pallas kernels can DMA
   whole chunks without ever touching a neighboring tile's slots (TPU has
   no atomics and no masked DMA — alignment replaces both).

Performance notes (measured on v5e): 1-D gathers/searchsorted with ~2M
queries are pathologically slow on TPU (a 17-step binary search of 2M
queries ≈ 250 ms; five separate 1-D table gathers ≈ 70 ms), while ROW
gathers of packed multi-column records are access-granularity bound —
BUT their row-major operands/outputs lane-pad to 128 on TPU, so every
capacity-sized record stream here is either blocked (gather + reshape +
transpose fused to exact storage) or scan-reconstructed.

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
_TROW_SHIFT = 11    # (tile row, first tile x) packed as row*2048 + x0,
_TROW_BASE = 1 << _TROW_SHIFT  # exact in int32/f32 up to 32k-wide screens


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
                  final_capacity: int = None) -> BinningOut:
    """Bin Gaussians into per-tile depth-ordered slot lists.

    When ``cull_abc=(A, B, C)``/``rho2max`` (from preprocess) are given,
    each Gaussian expands only the tiles inside a conservative per-row
    x-interval of its support (widest conic chord over the row's
    y-strip plus the low-pass filter chord, inflated so f32 slop can
    only add tiles — tests/test_cull.py proves the superset property
    against the exact per-tile oracle ``_pair_contributes``). Without
    them every row expands its full bbox width. The final slot arrays
    may be allocated tighter via ``final_capacity`` (expansion
    bookkeeping stays at ``pairs_capacity``).
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
    counts0 = jnp.where(visible, rh0, 0)          # LEVEL-1: tile ROWS
    f32 = jnp.float32
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
        icols = [cx0, cy0, r2m, quu, quv, gu, alf, bet, gam, margf]
    else:
        z = jnp.zeros_like(cx0)
        icols = [cx0, cy0, z, z, z, z, z, z, z, z - 1.0]  # fallback: full
    cols = [counts0.astype(f32), ty0.astype(f32), tx0.astype(f32),
            tx1.astype(f32)] + icols
    rtab = jnp.stack(cols, axis=1)[g_order]                # (N, 14)
    counts = rtab[:, 0].astype(jnp.int32)                  # rows/gaussian

    cumR = jnp.cumsum(counts)                              # inclusive
    totalR = cumR[-1]            # rows <= N*nty < 2^31: cannot wrap
    demand_rows_f = jnp.sum(counts.astype(f32))

    # ---- level 1: expand Gaussians into (gaussian, tile-row) pairs ----
    # Gather-free: each Gaussian's attributes are SCATTERED at its row-
    # range start and forward-filled along row slots (rows per Gaussian
    # are contiguous). A capacity-sized row gather would cost ~20 ns per
    # row on v5e regardless of width — the forward-fill's ~7 elementwise
    # lane-shift passes move the same data at streaming bandwidth. The
    # row-range start itself forward-fills by cummax (starts monotone).
    R_cap = pairs_capacity
    pos1 = jnp.arange(R_cap, dtype=jnp.int32)
    starts1 = cumR - counts
    seg_src1 = jnp.where(counts > 0, starts1, R_cap)
    start1_pp = jax.lax.cummax(
        jnp.zeros((R_cap,), jnp.int32).at[seg_src1].max(
            starts1, mode="drop"))
    flag1 = jnp.zeros((R_cap,), bool).at[seg_src1].set(True, mode="drop")

    def scat1(colv):
        return jnp.zeros((R_cap,), colv.dtype).at[seg_src1].set(
            colv, mode="drop")

    # rtab cols (depth order): 0 counts, 1 ty0, 2 tx0, 3 tx1, 4 cx,
    # 5 cy, 6 r2m, 7 quu, 8 quv, 9 gu, 10 alf, 11 bet, 12 gam, 13 margf
    fcols = _ffill_k(flag1, *[scat1(rtab[:, i]) for i in range(1, 14)],
                     scat1(g_order.astype(f32)))
    c1 = lambda c: fcols[c - 1].reshape(-1, _GB)           # (R/GB, GB)
    # c1 index == rtab col: 1 ty0, 2 tx0, 3 tx1, 4 cx, 5 cy, 6 r2m,
    # 7 quu, 8 quv, 9 gu, 10 alf, 11 bet, 12 gam, 13 margf; 14 = gid
    pos1b = pos1.reshape(-1, _GB)
    k1 = pos1b - start1_pp.reshape(-1, _GB)
    ty = c1(1).astype(jnp.int32) + k1                      # tile row
    g_tx0 = c1(2).astype(jnp.int32)
    g_tx1 = c1(3).astype(jnp.int32)
    cxg, cyg = c1(4), c1(5)
    row_ok = pos1b < totalR

    # Conservative per-row x-interval of the splat's support. The strip
    # is the row's pixel-center y-range in centered coords; the conic
    # interval is [min chord center - widest half, max + widest half]
    # (chord centers are linear in v, the discriminant concave), the
    # low-pass filter contributes an exact circle chord; both are
    # inflated (absolute eps on the discriminant + 2 px margins) so f32
    # slop can only ADD tiles, never drop a contributing one. The
    # kernels' per-pixel test remains the exact arbiter.
    ya = (ty * TILE_H).astype(f32)
    yb = jnp.minimum(ya + (TILE_H - 1), height - 1.0)
    va = ya - cyg
    vb = yb - cyg
    margfg = c1(13)
    condg = margfg > 0.0
    quug = jnp.where(condg, c1(7), 1.0)
    quvg, gug = c1(8), c1(9)
    alfg = c1(10)
    betg, gamg = c1(11), c1(12)

    def _disc(v):
        # absolute inflation ~1000x f32 eps of the evaluation
        # magnitudes: rounding can only widen the chord, never drop a
        # contributing tile
        d = (alfg * v + 2.0 * betg) * v + gamg
        return d + 1e-4 * (jnp.abs(alfg) * v * v
                           + 2.0 * jnp.abs(betg) * jnp.abs(v)
                           + jnp.abs(gamg))

    # strip max of the concave/convex discriminant: endpoints always,
    # plus the clamped vertex when concave (alf < 0, the elliptic case)
    alf_safe = jnp.where(alfg < 0.0, alfg, -1.0)
    vhat = jnp.clip(-betg / alf_safe, va, vb)
    disc = jnp.maximum(jnp.maximum(_disc(va), _disc(vb)),
                       jnp.where(alfg < 0.0, _disc(vhat), -jnp.inf))
    cne = condg & (disc >= 0.0)
    half = jnp.sqrt(jnp.maximum(disc, 0.0)) / quug
    ca = -(quvg * va + gug) / quug
    cb = -(quvg * vb + gug) / quug
    ulo_c = jnp.minimum(ca, cb) - half
    uhi_c = jnp.maximum(ca, cb) + half
    marg = margfg * (jnp.abs(ulo_c) + jnp.abs(uhi_c)) + 2.0
    ulo_c, uhi_c = ulo_c - marg, uhi_c + marg
    rf2 = c1(6) * (1.0 / FILTER_INV_SQUARE)
    dyf = jnp.maximum(jnp.maximum(va, -vb), 0.0)
    fne = condg & (dyf * dyf <= rf2)
    fhalf = jnp.sqrt(jnp.maximum(rf2 - dyf * dyf, 0.0)) + 1.0
    big = jnp.float32(1e9)
    ulo = jnp.minimum(jnp.where(cne, ulo_c, big),
                      jnp.where(fne, -fhalf, big))
    uhi = jnp.maximum(jnp.where(cne, uhi_c, -big),
                      jnp.where(fne, fhalf, -big))
    jx0 = jnp.clip(jnp.floor((cxg + ulo) / TILE_W).astype(jnp.int32),
                   g_tx0, g_tx1)
    jx1 = jnp.clip(jnp.floor((cxg + uhi) / TILE_W).astype(jnp.int32) + 1,
                   jx0, g_tx1)
    jx0 = jnp.where(condg, jx0, g_tx0)       # fallback: full bbox width
    jx1 = jnp.where(condg, jx1, g_tx1)
    cnt2 = jnp.where(row_ok, jx1 - jx0, 0)
    trow = ty * _TROW_BASE + jx0             # packed (row, x0) < 2^24
    gidrow = c1(14).astype(jnp.int32)

    # ---- level 2: expand rows into (gaussian, tile) pairs -------------
    # Gather-free: a per-pair row-gather would need an R-sized row-major
    # operand (lane-padded 16 GB at 2^25). Instead scatter each row's
    # attributes at its pair-range start and forward-fill along slots —
    # the range start by cummax (starts are monotone), (trow, gid) by a
    # 3-operand associative select-scan.
    cnt2f = cnt2.reshape(-1)
    cum2 = jnp.cumsum(cnt2f)
    total2 = cum2[-1]
    # int32 cumsum wraps when raw demand exceeds 2^31 (possible early in
    # training); a f32 sum cannot wrap and guards the overflow flag.
    demand2_f = jnp.sum(cnt2f.astype(f32))
    starts2 = cum2 - cnt2f
    seg_src2 = jnp.where(cnt2f > 0, starts2, pairs_capacity)
    start_pp = jax.lax.cummax(
        jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].max(
            starts2, mode="drop"))
    flag0 = jnp.zeros((pairs_capacity,), bool).at[seg_src2].set(
        True, mode="drop")
    trow0 = jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].set(
        trow.reshape(-1), mode="drop")
    gid0 = jnp.zeros((pairs_capacity,), jnp.int32).at[seg_src2].set(
        gidrow.reshape(-1), mode="drop")
    trow_pp, gid_pp = _ffill_k(flag0, trow0, gid0)

    pos2 = jnp.arange(pairs_capacity, dtype=jnp.int32)
    k2 = pos2 - start_pp
    ty2 = jax.lax.shift_right_logical(trow_pp, _TROW_SHIFT)
    jx2 = trow_pp - ty2 * _TROW_BASE + k2
    tile = ty2 * ntx + jx2
    pair_gid = gid_pp
    pv_flat = pos2 < total2
    tile_key = jnp.where(pv_flat, tile, T).astype(jnp.int32)

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

    # Compact BEFORE the sort: scatter the survivors' (tile, gid) into
    # dense compact positions, then sort only final_capacity entries.
    # The expansion scatter is order-preserving, so compact order is
    # still (depth, rect-scan) order and the stable tile sort leaves
    # every tile depth-ordered exactly as before. At trained 1080p scale
    # the exact cull keeps ~4.3M of ~27M bbox pairs — sorting the
    # pre-cull expansion burned ~6x the necessary sort work (the sort is
    # the superlinear part of binning; measured 838 ms total at 29.4M
    # capacity, r3).
    ctile = jnp.full((P_fin,), T, jnp.int32).at[compact_dst].set(
        tile_key, mode="drop")
    cgid = jnp.zeros((P_fin,), jnp.int32).at[compact_dst].set(
        pair_gid, mode="drop")
    # (invalid pairs carry tile_key == T and target position P_fin —
    # dropped; compact padding positions keep key T and sort to the end)

    # Stable sort by tile key; depth order is preserved within each tile.
    # The third operand carries each entry's compact gradient position so
    # the slot permutation can be inverted into compact coordinates.
    key_sorted, gid_sorted, c_sorted = jax.lax.sort(
        (ctile, cgid, jnp.arange(P_fin, dtype=jnp.int32)),
        num_keys=1, is_stable=True)

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
    overflow = ((padded_total > P_fin) | (total2 > pairs_capacity)
                | (demand2_f > jnp.float32(pairs_capacity))
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
    pos = jnp.arange(P_fin, dtype=jnp.int32)
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
    # per-Gaussian segment bounds in compact coordinates: each
    # Gaussian's level-2 pair block spans [starts2[first row],
    # starts2[one-past-last row]) (rows are contiguous per Gaussian, so
    # the block is contiguous even across empty rows); then the
    # exclusive validity prefix maps those to compact positions.
    starts2_ext = jnp.concatenate([starts2, total2[None]])
    gstart2 = jnp.clip(starts2_ext[jnp.minimum(starts1, R_cap)],
                       0, pairs_capacity)
    gend2 = jnp.clip(starts2_ext[jnp.minimum(cumR, R_cap)],
                     0, pairs_capacity)
    excl = jnp.concatenate([jnp.zeros((1,), jnp.int32), valid_cum])
    seg_start = jnp.minimum(excl[gstart2], P_fin)
    seg_end = jnp.minimum(excl[gend2], P_fin)

    return BinningOut(
        gid=gid, slot_valid=slot_valid,
        tile_start=aligned_start, tile_count=tile_count,
        num_pairs=num_pairs, padded_total=padded_total, overflow=overflow,
        inv=inv, seg_start=seg_start, seg_end=seg_end,
        order=g_order.astype(jnp.int32),
        num_expanded=total2,
    )


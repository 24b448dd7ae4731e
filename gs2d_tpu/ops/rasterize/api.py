"""Public rasterizer API: preprocess → bin → Pallas kernels → image.

The custom-VJP boundary wraps only the tiled compositing core (entries →
tile images). Everything around it — the projective preprocess, the entry
gather (whose VJP is the per-Gaussian scatter-add that replaces CUDA
atomics), background compositing, and un-tiling — is pure jnp and
differentiated by JAX itself.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .binning import MAX_PAIRS_CAPACITY, BinningOut, bin_gaussians
from .common import (ENTRY_F, NUM_OUT, TILE_H, TILE_PX, TILE_W, cdiv,
                     pad_to)
from .kernel_fwd import rasterize_fwd_pallas
from .oracle import rasterize_oracle
from .preprocess import PreprocessOut


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    width: int
    height: int
    pairs_capacity: int = 1 << 21
    chunk: int = 128
    impl: str = "pallas"      # "pallas" | "oracle"
    interpret: bool = False   # run Pallas in interpreter mode (CPU tests)
    # slot capacity AFTER the interval cull (binning.py). None →
    # pairs_capacity. The expansion bookkeeping stays at pairs_capacity;
    # every final-slot cost (expansion gather, kernel streams, d_entries)
    # scales with this smaller knob.
    final_capacity: Optional[int] = None
    cull: bool = True         # conservative interval cull in binning
    # level-1 (gaussian, tile-row) bookkeeping capacity. None →
    # pairs_capacity. Rows are typically ~2x fewer than pairs and every
    # scatter into the row space costs ~9 ns per slot on v5e — probe-size
    # it (suggest_capacities).
    rows_capacity: Optional[int] = None


def pack_entries(pre: PreprocessOut) -> jnp.ndarray:
    """Per-Gaussian kernel record, layout per common.py FLD_*: (N, 24)."""
    return jnp.concatenate(
        [
            pre.A, pre.B, pre.C, pre.c2, pre.center2d,
            pre.opacity[:, None], pre.rgb, pre.normal, pre.noise,
        ],
        axis=-1,
    )


def untile(out_tiles: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(T, NUM_OUT, TILE_PX) tile-major → (NUM_OUT, height, width)."""
    ntx = cdiv(width, TILE_W)
    nty = cdiv(height, TILE_H)
    x = out_tiles.reshape(nty, ntx, NUM_OUT, TILE_H, TILE_W)
    x = x.transpose(2, 0, 3, 1, 4).reshape(NUM_OUT, nty * TILE_H, ntx * TILE_W)
    return x[:, :height, :width]


@jax.custom_vjp
def _gather_barrier(x):
    return jax.lax.optimization_barrier(x)


def _gather_barrier_fwd(x):
    return jax.lax.optimization_barrier(x), None


def _gather_barrier_bwd(_, g):
    # Barrier the cotangent too: the VJP of the expansion gather is a
    # per-Gaussian scatter-add, which must likewise not swallow upstream math.
    return (jax.lax.optimization_barrier(g),)


_gather_barrier.defvjp(_gather_barrier_fwd, _gather_barrier_bwd)


# ---------------------------------------------------------------------------
# custom-VJP core: (packed records, bins) → tile images
#
# The expansion gather packed[gid] lives INSIDE the VJP boundary so its
# backward can be a contiguous segment sum in expansion order (pairs are
# grouped per depth-sorted Gaussian there) instead of JAX's scatter-add
# VJP — a scatter-add whose accumulator exceeds VMEM runs at ~0.3 G adds/s
# (measured 395 ms for 4M pairs → 500k Gaussians; the segment-sum path is
# a permutation row-gather + blocked triangular-matmul prefix sums + two
# endpoint row-gathers, ~25 ms).
# ---------------------------------------------------------------------------

def _segment_sum_rows(d_pairs: jnp.ndarray, seg_start: jnp.ndarray,
                      seg_end: jnp.ndarray) -> jnp.ndarray:
    """Per-segment sums of contiguous rows: Σ_{p∈[s_i,e_i)} d_pairs[p].

    128-row blocks: in-block inclusive prefixes via one batched triangular
    matmul on the MXU + a cumsum over block totals. The in-block and
    block-level parts are DIFFERENCED SEPARATELY — a single global prefix
    difference carries cancellation error ~ulp(global magnitude), while
    here segments inside one block are exact and multi-block segments only
    see block-cumsum rounding."""
    P, C = d_pairs.shape
    x = d_pairs
    if P % 128:
        x = jnp.concatenate(
            [x, jnp.zeros((128 - P % 128, C), x.dtype)], 0)
    B = x.shape[0] // 128
    xb = x.reshape(B, 128, C)
    tri = jnp.tril(jnp.ones((128, 128), x.dtype))
    pref = jnp.einsum("ij,bjc->bic", tri, xb,
                      precision=jax.lax.Precision.HIGHEST)
    flat_pref = pref.reshape(-1, C)                    # (B*128, C) in-block
    csum = jnp.cumsum(pref[:, -1, :], axis=0)          # (B, C) inclusive

    def at(idx):
        """(in-block prefix, block offset) just BEFORE position idx."""
        j = jnp.maximum(idx - 1, 0)
        b = j // 128
        nonzero = (idx > 0)[:, None]
        inp = jnp.where(nonzero, flat_pref[j], 0.0)
        off = jnp.where(nonzero & (b > 0)[:, None],
                        csum[jnp.maximum(b - 1, 0)], 0.0)
        return inp, off

    inp_e, off_e = at(seg_end)
    inp_s, off_s = at(seg_start)
    return (inp_e - inp_s) + (off_e - off_s)


def _segment_sum_rows_depth(d_pairs: jnp.ndarray, seg_end_d: jnp.ndarray,
                            inv_order: jnp.ndarray) -> jnp.ndarray:
    """_segment_sum_rows exploiting depth-order contiguity.

    In depth order the expansion segments tile the pair space
    (start_i = end_{i-1}), so the start endpoints are the end endpoints
    shifted by one — 2 capacity-sized row gathers instead of 4, plus one
    (N, C) reorder back to original gaussian order through ``inv_order``.
    Arithmetic is IDENTICAL to _segment_sum_rows (same two-part in-block /
    block-carry difference at the same positions), so results match it
    bit-for-bit after the reorder."""
    P, C = d_pairs.shape
    x = d_pairs
    if P % 128:
        x = jnp.concatenate(
            [x, jnp.zeros((128 - P % 128, C), x.dtype)], 0)
    B = x.shape[0] // 128
    xb = x.reshape(B, 128, C)
    tri = jnp.tril(jnp.ones((128, 128), x.dtype))
    pref = jnp.einsum("ij,bjc->bic", tri, xb,
                      precision=jax.lax.Precision.HIGHEST)
    flat_pref = pref.reshape(-1, C)                    # (B*128, C) in-block
    csum = jnp.cumsum(pref[:, -1, :], axis=0)          # (B, C) inclusive

    j = jnp.maximum(seg_end_d - 1, 0)
    b = j // 128
    nonzero = (seg_end_d > 0)[:, None]
    inp_e = jnp.where(nonzero, flat_pref[j], 0.0)
    off_e = jnp.where(nonzero & (b > 0)[:, None],
                      csum[jnp.maximum(b - 1, 0)], 0.0)
    zrow = jnp.zeros((1, C), d_pairs.dtype)
    inp_s = jnp.concatenate([zrow, inp_e[:-1]], axis=0)
    off_s = jnp.concatenate([zrow, off_e[:-1]], axis=0)
    d_depth = (inp_e - inp_s) + (off_e - off_s)
    return d_depth[inv_order]


def _block_entries(packed, gid, chunk):
    """(N, F) table + (P,) slot→Gaussian ids → (P/chunk, F, chunk) wire.

    The row gather is XLA's; the blocked transpose turns its lane-padded
    (P, F) output into the kernels' exact-storage wire format (Mosaic
    rejects HBM DMA slices with a non-128 minor dim, and a (P, F) HBM
    buffer is physically (P, 128) — 5.3x footprint)."""
    rows = packed[gid]                                    # (P, F)
    return rows.reshape(-1, chunk, rows.shape[1]).transpose(0, 2, 1)


def _unblock_rows(blocked):
    """(P/chunk, F, chunk) kernel output → (P, F) rows for the glue."""
    return blocked.transpose(0, 2, 1).reshape(-1, blocked.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg: RasterizeConfig, packed, gid, inv, seg_end_d, inv_order,
          tile_start, tile_count):
    entries = _block_entries(packed, gid, cfg.chunk)
    out, _ = rasterize_fwd_pallas(
        entries, tile_start, tile_count,
        width=cfg.width, height=cfg.height, chunk=cfg.chunk,
        interpret=cfg.interpret)
    return out


def _core_fwd(cfg, packed, gid, inv, seg_end_d, inv_order,
              tile_start, tile_count):
    entries = _block_entries(packed, gid, cfg.chunk)
    out, med_idx = rasterize_fwd_pallas(
        entries, tile_start, tile_count,
        width=cfg.width, height=cfg.height, chunk=cfg.chunk,
        interpret=cfg.interpret)
    return out, (entries, inv, seg_end_d, inv_order,
                 tile_start, tile_count, out, med_idx)


def _core_bwd(cfg, res, g):
    from .kernel_bwd import rasterize_bwd_pallas

    (entries, inv, seg_end_d, inv_order, tile_start, tile_count,
     out, med_idx) = res
    P_alloc = entries.shape[0] * cfg.chunk
    N = inv_order.shape[0]
    d_blk = rasterize_bwd_pallas(
        entries, tile_start, tile_count, out, g, med_idx,
        width=cfg.width, height=cfg.height, chunk=cfg.chunk,
        interpret=cfg.interpret)          # (P/chunk, DENTRY_F, chunk) blocks
    d_raw = _unblock_rows(d_blk)                    # (P, DENTRY_F=22) rows
    # slot order → expansion order (dropped pairs contribute zero;
    # padding slots — including never-DMA-written ones — are simply
    # never gathered)
    ok = inv < P_alloc
    d_pairs = d_raw[jnp.where(ok, inv, 0)]
    d_pairs = jnp.where(ok[:, None], d_pairs, 0.0)
    # Depth-order endpoint dedup: segments tile the expansion space in
    # depth order, so the prefix difference needs only END endpoints
    # there (2 capacity-sized row gathers, not 4) + one (N, 22) reorder
    # back to original gaussian order.
    d_g = _segment_sum_rows_depth(d_pairs, seg_end_d, inv_order)  # (N, 22)
    # Widen to the packed-entry layout only at N-size: the center columns'
    # gradient is identically zero (common.py DENTRY_F), so the wire, the
    # P-sized gather, and the segment sum all stay 22 columns.
    zero2 = jnp.zeros((N, 2), d_raw.dtype)
    d_packed = jnp.concatenate(
        [d_g[:, :12], zero2, d_g[:, 12:]], axis=1)             # (N, 24)
    return d_packed, None, None, None, None, None, None


_core.defvjp(_core_fwd, _core_bwd)


@functools.lru_cache(maxsize=64)
def _probe_fn(width: int, height: int, capacity: int, chunk: int,
              cull: bool):
    if cull:
        return jax.jit(lambda c2, ex, dp, vis, abc, r2m: bin_gaussians(
            c2, ex, dp, vis, width, height, capacity, chunk,
            cull_abc=abc, rho2max=r2m))
    return jax.jit(lambda c2, ex, dp, vis: bin_gaussians(
        c2, ex, dp, vis, width, height, capacity, chunk))


def suggest_capacities(pre: PreprocessOut, width: int, height: int,
                       chunk: int = 128, slack: float = 1.1,
                       probe_capacity: int = 1 << 22,
                       cull: bool = True) -> tuple:
    """One probe binning at a generous capacity → tight, chunk-aligned
    ``(pairs_capacity, final_capacity, rows_capacity)`` for this
    scene/view. Every
    capacity-proportional cost (the tile-key sort and expansion
    bookkeeping scale with the first; the expansion gather, kernel
    streams, and backward d_entries with the second) shrinks with them —
    a power-of-two bucket typically overshoots the padded need by 25-90%.

    If the probe itself overflows, its padded_total is clamped and would
    silently underestimate — re-probe at growing capacities until the
    demand fits."""
    for _ in range(8):
        # jitted probe: eager dispatch costs one host↔device round trip
        # PER OP on tunneled backends (~60 ops × ~40 ms). The wrapper is
        # cached per static config so repeat calls hit jit's trace cache
        # (a fresh lambda per call would retrace every time); the
        # persistent compile cache covers cross-process reuse.
        fn = _probe_fn(width, height, probe_capacity, chunk, cull)
        if cull:
            bins = fn(pre.center2d, pre.extent, pre.depth, pre.visible,
                      (pre.A, pre.B, pre.C), pre.rho2max)
        else:
            bins = fn(pre.center2d, pre.extent, pre.depth, pre.visible)
        if not bool(bins.overflow):
            break
        if probe_capacity >= MAX_PAIRS_CAPACITY:
            raise ValueError(
                "pair demand exceeds the exact bookkeeping ceiling "
                f"(2^25 = {MAX_PAIRS_CAPACITY}); reduce resolution or "
                "splat extents")
        # x2 (not x4): a probe one notch too large doubles the sort and
        # attribute-stream footprint for nothing, and 2^25 is already
        # the HBM budget line.
        probe_capacity = min(probe_capacity * 2, MAX_PAIRS_CAPACITY)
    else:
        raise ValueError(
            f"pair demand still exceeds probe capacity {probe_capacity}")
    exp_need = int(bins.num_expanded)
    fin_need = int(bins.padded_total)
    rows_need = int(bins.num_rows)
    exp_cap = max(pad_to(int(exp_need * slack), chunk), chunk)
    fin_cap = max(pad_to(int(fin_need * slack), chunk), chunk)
    fin_cap = min(fin_cap, MAX_PAIRS_CAPACITY)
    # the expansion capacity must also satisfy the blocked attribute
    # gather's 128-lane alignment (binning._GB) even for small chunks
    cap = min(pad_to(max(exp_cap, fin_cap), 128), MAX_PAIRS_CAPACITY)
    rows_cap = min(pad_to(max(int(rows_need * slack), 128), 128), cap)
    return cap, fin_cap, rows_cap


def suggest_pairs_capacity(pre: PreprocessOut, width: int, height: int,
                           chunk: int = 128, slack: float = 1.1,
                           probe_capacity: int = 1 << 22) -> int:
    """Single-knob variant of suggest_capacities (expansion bound)."""
    return suggest_capacities(pre, width, height, chunk, slack,
                              probe_capacity)[0]


def rasterize(pre: PreprocessOut, cfg: RasterizeConfig):
    """Rasterize preprocessed Gaussians.

    Returns (out, aux): out is (NUM_OUT, H, W) float32 (rgb channels carry
    no background — callers composite ``rgb + (1-alpha)*bg``); aux carries
    binning diagnostics.
    """
    if cfg.impl == "oracle":
        out = rasterize_oracle(pre, cfg.width, cfg.height)
        return out, {"num_pairs": jnp.int32(-1), "overflow": jnp.bool_(False),
                    "padded_total": jnp.int32(-1),
                    "num_expanded": jnp.int32(-1),
                    "num_rows": jnp.int32(-1)}

    bins: BinningOut = bin_gaussians(
        pre.center2d, pre.extent, pre.depth, pre.visible,
        cfg.width, cfg.height, cfg.pairs_capacity, cfg.chunk,
        cull_abc=(pre.A, pre.B, pre.C) if cfg.cull else None,
        rho2max=pre.rho2max if cfg.cull else None,
        final_capacity=cfg.final_capacity,
        rows_capacity=cfg.rows_capacity)
    packed = pack_entries(pre)                       # (N, 24) differentiable
    # Zero any row carrying a non-finite value (binning deliberately keeps
    # such pairs): a zero row has p2 == 0 ⇒ the kernels cull it exactly as
    # NaN-comparison semantics used to, and its gradient is zero. This must
    # happen before the wire blocking — the in-kernel MXU identity
    # transpose would otherwise spread one Inf·0 = NaN across its whole
    # chunk. N-sized, so the pass is free next to the P-sized gather.
    finite = jnp.isfinite(packed).all(axis=1, keepdims=True)
    packed = jnp.where(finite, packed, 0.0)
    # Materialize the packed records before the big expansion gather —
    # without the barrier XLA fuses the per-Gaussian preprocess math into
    # the gather, recomputing it per *pair* as 24 scalar column gathers
    # (~80x slower on TPU, measured: 415ms → 5ms at 1080p/540k pairs).
    packed = _gather_barrier(packed)
    out_tiles = _core(cfg, packed, bins.gid, bins.inv, bins.seg_end_d,
                      bins.inv_order,
                      bins.tile_start, bins.tile_count)
    out = untile(out_tiles, cfg.width, cfg.height)
    return out, {"num_pairs": bins.num_pairs, "overflow": bins.overflow,
                 "padded_total": bins.padded_total,
                 "num_expanded": bins.num_expanded,
                 "num_rows": bins.num_rows}

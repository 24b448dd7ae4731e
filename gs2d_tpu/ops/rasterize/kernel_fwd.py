"""Pallas TPU forward rasterization kernel.

One grid program composites one (TILE_H, TILE_W) pixel tile (16x32 —
near-square tiles minimize per-splat pixel work), flattened to TILE_PX
lanes. Entries (depth-sorted, CHUNK-aligned per tile — see binning.py)
arrive chunk-blocked (P/chunk, ENTRY_F, chunk) — each block one
contiguous, Mosaic-tiling-legal 12 KB HBM region — streamed HBM→VMEM
with double-buffered async DMA, then rotated to (chunk, ENTRY_F)
compute rows by one bit-exact MXU identity matmul per chunk.

TPU-native compositing: instead of a per-splat sequential loop (the CUDA
shape), each CHUNK of splats is composited in closed form —
  * per-(splat, pixel) geometry is 2 FMAs per homogeneous component
    (pixel-linear intersection coefficients from preprocess.py),
  * ONE transmittance prefix-product scan per chunk, done as
    log2(chunk) sublane shift+multiplies on the VPU — the oracle's
    T *= (1-alpha) recurrence verbatim, with zero per-splat
    transcendentals (the former log-space scan paid log1p+exp each),
  * the early-termination contract (stop before transmittance < 1e-4,
    reference SURVEY.md §2.1 step 3) is reproduced exactly with a
    keep-mask on the inclusive product + a per-pixel frozen flag; the
    mask is monotone within a chunk (q ≤ 1), so the kept exclusive
    product equals the all-entries one for every kept splat; whole-tile
    early exit predicates the compute block on a scalar done flag inside
    a STATIC fori_loop (a data-dependent while_loop stalls the DMA
    pipeline — measured 2.7x slower),
  * the depth-distortion accumulator needs NO per-splat prefix state:
    Σ_{i<j} w_i w_j (m_i − m_j)² ≡ S0·S2 − S1² with S0 = Σw (alpha),
    S1 = Σw·m, S2 = Σw·m² — plain totals, emitted as output channels
    anyway for the backward kernel.

Output channels per common.py: rgb(3, no background — added by the caller),
expected-depth sum, alpha, view normal(3), median depth, distortion,
noise(3), and M1/M2 aux totals consumed by the backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (ENTRY_F, NUM_OUT, T_EPS, TILE_H, TILE_PX, TILE_W, cdiv)
from .kernel_common import (chunk_geometry, entry_validity, mapped_depth,
                            mxu_dot_t, mxu_transpose,
                            prefix_prod_excl_from_incl, prefix_prod_incl)

NUM_STATE = 16
# state rows: 0 running transmittance T (product domain), 1 crossed,
#             2:5 color, 5 D, 6:9 normal, 9 median, 10:13 noise, 13 M1,
#             14 M2, 15 median contributor slot index


def _pixel_coords(t, ntx):
    tile_x = (jax.lax.rem(t, ntx) * TILE_W).astype(jnp.float32)
    tile_y = (jax.lax.div(t, ntx) * TILE_H).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PX), 1)
    px = tile_x + jax.lax.rem(lane, TILE_W).astype(jnp.float32)
    py = tile_y + jax.lax.div(lane, TILE_W).astype(jnp.float32)
    return px, py


def _fwd_kernel(ts_ref, tc_ref, entries, out_ref, med_ref, state, ebuf,
                sem, done_flag, *, ntx: int, chunk: int, width: int,
                height: int):
    t = pl.program_id(0)
    start = ts_ref[t]
    count = tc_ref[t]
    nchunks = jax.lax.div(count + chunk - 1, chunk)
    px, py = _pixel_coords(t, ntx)

    state[...] = jnp.zeros((NUM_STATE, TILE_PX), jnp.float32)
    state[0:1] = jnp.ones((1, TILE_PX), jnp.float32)   # running T (product)
    # out-of-image border pixels start "crossed" so edge tiles can take
    # the all-pixels-done early exit (their output is cropped anyway)
    state[1:2] = ((px >= width) | (py >= height)).astype(jnp.float32)
    state[15:16] = -jnp.ones((1, TILE_PX), jnp.float32)

    start_blk = jax.lax.div(start, chunk)

    def dma(slot, ci):
        # entries is chunk-blocked (P_alloc/chunk, ENTRY_F, chunk): one
        # block is one CONTIGUOUS 12 KB HBM region whose minor dim (chunk)
        # satisfies Mosaic's 128-lane slice tiling — a row-major (P, F)
        # array would pad F→128 lanes in HBM (5.3x footprint) AND reject
        # the (chunk, F) DMA slice outright. tile_start is chunk-aligned
        # by binning, so block indexing is exact.
        return pltpu.make_async_copy(
            entries.at[start_blk + ci],
            ebuf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    done_flag[0] = 0

    # Early termination, TPU-shaped: a data-dependent while_loop stalls the
    # DMA pipeline on a vector→scalar sync at every trip-count check
    # (measured 2.7x slower than a static loop at 1080p). Instead the loop
    # has a STATIC trip count — DMAs stream unconditionally (semaphore
    # hygiene + pipelining) — and only the compute block is predicated on
    # a scalar done flag written at the end of the previous chunk.
    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nchunks)
        def _():
            dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        dma(slot, ci).wait()

        @pl.when(done_flag[0] == 0)
        def _():
            # (ENTRY_F, chunk) wire block → (chunk, ENTRY_F) compute rows
            e = mxu_transpose(ebuf[slot])

            geom = chunk_geometry(e, px, py)
            crossed_in = state[1:2]
            ok = entry_validity(geom, ci, chunk, count, crossed_in)
            a0 = jnp.where(ok, geom.alpha, 0.0)

            # transmittance scan in product space (exactly the oracle's
            # T *= (1-alpha) recurrence; see prefix_prod_incl)
            q = 1.0 - a0
            p_incl = prefix_prod_incl(q)
            T_in = state[0:1]
            keep = (p_incl * T_in) >= T_EPS
            cross = (a0 > 0.0) & jnp.logical_not(keep)
            a_eff = jnp.where(keep, a0, 0.0)
            # keep is monotone within a chunk (q <= 1), so for every kept
            # splat the exclusive product over kept == over all entries
            T_before = T_in * prefix_prod_excl_from_incl(p_incl)
            w = a_eff * T_before
            live = a_eff > 0.0
            zs, m = mapped_depth(geom.z, live)
            wm = w * m

            sel = live & (T_before > 0.5)
            ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, TILE_PX), 0)
            last = jnp.max(jnp.where(sel, ii, -1), axis=0, keepdims=True)
            med = jnp.sum(jnp.where(sel & (ii == last), zs, 0.0),
                          axis=0, keepdims=True)
            state[9:10] = jnp.where(last >= 0, med, state[9:10])
            # median contributor's tile-local slot index — the backward
            # credits the median-depth gradient by exact integer identity
            # instead of bit-matching a recomputed float depth (the CUDA
            # kernels likewise persist a per-pixel contributor id)
            state[15:16] = jnp.where(
                last >= 0, (ci * chunk + last).astype(jnp.float32),
                state[15:16])

            # all 9 color/normal/noise accumulations as ONE MXU matmul —
            # contract the chunk axis of the (chunk, 9) payload columns
            # against w; overlaps with the VPU work
            acc9 = mxu_dot_t(e[:, 15:24], w)         # (9, TILE_PX)
            state[2:5] += acc9[0:3]
            state[6:9] += acc9[3:6]
            state[10:13] += acc9[6:9]
            state[5:6] += jnp.sum(zs * w, axis=0, keepdims=True)
            state[13:14] += jnp.sum(wm, axis=0, keepdims=True)
            state[14:15] += jnp.sum(wm * m, axis=0, keepdims=True)
            # the running product is non-increasing, so the product over
            # the kept prefix is the MIN of the kept inclusive products
            state[0:1] = T_in * jnp.min(
                jnp.where(keep, p_incl, 1.0), axis=0, keepdims=True)
            crossed = jnp.maximum(
                crossed_in, jnp.max(cross.astype(jnp.float32), axis=0,
                                    keepdims=True))
            state[1:2] = crossed
            done_flag[0] = (jnp.sum(crossed) >= float(TILE_PX)
                            ).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    med_ref[0, 0:1] = state[15:16]
    T_final = state[0:1]
    S0 = 1.0 - T_final
    M1 = state[13:14]
    M2 = state[14:15]
    out_ref[0, 0:3] = state[2:5]
    out_ref[0, 3:4] = state[5:6]
    out_ref[0, 4:5] = S0
    out_ref[0, 5:8] = state[6:9]
    out_ref[0, 8:9] = state[9:10]
    out_ref[0, 9:10] = S0 * M2 - M1 * M1     # distortion ≡ S0·S2 − S1²
    out_ref[0, 10:13] = state[10:13]
    out_ref[0, 13:14] = M1
    out_ref[0, 14:15] = M2


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk",
                                             "interpret"))
def rasterize_fwd_pallas(entries: jnp.ndarray, tile_start: jnp.ndarray,
                         tile_count: jnp.ndarray, *, width: int, height: int,
                         chunk: int = 128,
                         interpret: bool = False):
    """entries (P_alloc/chunk, ENTRY_F, chunk) f32 blocks → (out, med_idx):
    out (T, NUM_OUT, TILE_PX) f32; med_idx (T, 1, TILE_PX) f32 carries the
    per-pixel median contributor's tile-local slot (backward-only aux)."""
    if not interpret:
        assert chunk % 128 == 0, "hardware DMA needs 128-lane-aligned chunks"
    assert entries.ndim == 3 and entries.shape[1:] == (ENTRY_F, chunk)
    ntx = cdiv(width, TILE_W)
    nty = cdiv(height, TILE_H)
    T = ntx * nty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, NUM_OUT, TILE_PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NUM_STATE, TILE_PX), jnp.float32),
            pltpu.VMEM((2, ENTRY_F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_fwd_kernel, ntx=ntx, chunk=chunk,
                               width=width, height=height)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, NUM_OUT, TILE_PX), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TILE_PX), jnp.float32),
        ),
        interpret=interpret,
    )(tile_start, tile_count, entries)

"""Pallas TPU backward rasterization kernel (hand-written VJP core).

Replaces the CUDA back-to-front gradient kernel (SURVEY.md §2.1 step 4)
with a TPU-native single-pass front-to-back formulation that needs no
transmittance division chains and no atomics:

  For L = f({w_e}, T_F) with w_e = α_e·T_e, the α-gradient is
      dα_e = T_e·dw_e − [Σ_{j>e} w_j·dw_j + T_F·dT_F] / (1−α_e),
  where dw_e (the partial w.r.t. w_e with other w fixed) is closed-form in
  per-entry values and per-pixel TOTALS:

  * The depth-distortion channel uses the exact identity
    Σ_{i<j} w_i w_j (m_i−m_j)² ≡ S0·S2 − S1² (S0 = Σw, S1 = Σw·m,
    S2 = Σw·m²), so its w- and m-gradients are
        ∂/∂w_e = m_e²·S0 + S2 − 2·m_e·S1,
        ∂/∂m_e = 2·w_e·(m_e·S0 − S1)
    (the i=j self terms cancel), with S0/S1/S2 read straight from the
    forward's alpha / M1 / M2 output channels — no per-splat prefix or
    suffix accumulators at all.

  * The grand total Σ_j w_j·dw_j needs no extra pass: every term of dw_j
    is value·cotangent for some output channel, so it collapses to
    Σ_ch g_ch·out_ch over the accumulation channels — with the distortion
    channel counted TWICE (Σ_e w_e·(m²S0+S2−2mS1)_e = 2·(S0S2−S1²)).

  A single front-to-back pass recomputes the forward transmittance scan
  (one product-space shift-scan per chunk — the oracle's T *= (1-alpha)
  recurrence, no per-splat transcendentals), forms the suffix Σ_{j>e} w_j·dw_j
  as grand total minus inclusive prefix (a second shift-scan), chains
  gradients back through the compositing → alpha → homography-coefficient
  algebra, reduces over the tile's pixels, and DMAs the per-entry gradient
  chunk to HBM. Entry slots are tile-disjoint by construction
  (CHUNK-aligned binning), so writes never race; the final per-Gaussian
  reduction is the VJP of the jnp gather (a segment-sum).

  The low-pass (rho2d) branch carries no gradient, matching the
  reference's removal of the low-pass filter gradient (README.md:114).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (DENTRY_F, ENTRY_F, NEAR_N, NUM_OUT, T_EPS, TILE_PX,
                     TILE_W, cdiv)
from .kernel_common import (M_SCALE, chunk_geometry, entry_validity,
                            mapped_depth, mxu_transpose,
                            prefix_prod_excl_from_incl, prefix_prod_incl,
                            prefix_scan_incl)
from .kernel_fwd import _pixel_coords

NUM_STATE = 4
# state rows: 0 running transmittance T (product domain), 1 crossed,
#             2 P_wdw (running inclusive prefix of w·dw), 3 pad


def _recompute_chunk(e, px, py, ci, chunk, count, state):
    """Shared forward recomputation: transmittance product scan only
    (mirrors kernel_fwd — the oracle's T *= (1-alpha) recurrence with no
    per-splat transcendentals). Returns t_mult, the chunk's kept
    transmittance factor, for the multiplicative state update."""
    geom = chunk_geometry(e, px, py)
    crossed_in = state[1:2]
    ok = entry_validity(geom, ci, chunk, count, crossed_in)
    a0 = jnp.where(ok, geom.alpha, 0.0)
    q = 1.0 - a0
    p_incl = prefix_prod_incl(q)
    T_in = state[0:1]
    keep = (p_incl * T_in) >= T_EPS
    cross = (a0 > 0.0) & jnp.logical_not(keep)
    a_eff = jnp.where(keep, a0, 0.0)
    T_before = T_in * prefix_prod_excl_from_incl(p_incl)
    w = a_eff * T_before
    live = a_eff > 0.0
    zs, m = mapped_depth(geom.z, live)
    t_mult = jnp.min(jnp.where(keep, p_incl, 1.0), axis=0, keepdims=True)
    return geom, a_eff, t_mult, cross, T_before, w, live, zs, m


def _dw_terms(e, g, w, live, zs, m, S0, M1_tot, M2_tot):
    """dw_e = ∂L/∂w_e (other w fixed) and the m-gradient, totals-based."""
    gC0, gC1, gC2 = g[0:1], g[1:2], g[2:3]
    gD, gN0, gN1, gN2 = g[3:4], g[5:6], g[6:7], g[7:8]
    gDist = g[9:10]
    gH0, gH1, gH2 = g[10:11], g[11:12], g[12:13]
    gM1, gM2 = g[13:14], g[14:15]

    dw = (e[:, 15:16] * gC0 + e[:, 16:17] * gC1 + e[:, 17:18] * gC2
          + zs * gD
          + e[:, 18:19] * gN0 + e[:, 19:20] * gN1 + e[:, 20:21] * gN2
          + e[:, 21:22] * gH0 + e[:, 22:23] * gH1 + e[:, 23:24] * gH2
          + m * gM1 + m * m * gM2
          + gDist * (m * m * S0 + M2_tot - 2.0 * m * M1_tot))
    dw = jnp.where(live, dw, 0.0)

    dm = (w * gM1 + 2.0 * m * w * gM2
          + gDist * 2.0 * w * (m * S0 - M1_tot))
    return dw, dm


def _bwd_kernel(ts_ref, tc_ref, entries, out_tiles, g_tiles, med_tiles,
                d_entries, state, ebuf, wbuf, sem_r, sem_w, done_flag, *,
                ntx: int, chunk: int, width: int, height: int):
    t = pl.program_id(0)
    start = ts_ref[t]
    count = tc_ref[t]
    nchunks = jax.lax.div(count + chunk - 1, chunk)
    px, py = _pixel_coords(t, ntx)

    g = g_tiles[0]          # (NUM_OUT, TILE_PX)
    out = out_tiles[0]
    S0 = out[4:5]
    T_F = 1.0 - S0
    M1_tot = out[13:14]
    M2_tot = out[14:15]
    gMed = g[8:9]
    med_idx = med_tiles[0]                # (1, TILE_PX) contributor slot

    state[...] = jnp.zeros((NUM_STATE, TILE_PX), jnp.float32)
    state[0:1] = jnp.ones((1, TILE_PX), jnp.float32)   # running T (product)
    border = ((px >= width) | (py >= height)).astype(jnp.float32)
    state[1:2] = border

    start_blk = jax.lax.div(start, chunk)

    def dma_in(slot, ci):
        # chunk-blocked (P_alloc/chunk, ENTRY_F, chunk): contiguous,
        # tiling-legal block DMAs (see kernel_fwd.dma)
        return pltpu.make_async_copy(
            entries.at[start_blk + ci],
            ebuf.at[slot], sem_r.at[slot])

    def dma_out(slot, ci):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            d_entries.at[start_blk + ci],
            sem_w.at[slot])

    # Grand total Σ_j w_j·dw_j in closed form from outputs × cotangents;
    # the distortion channel enters twice (see module docstring).
    G_wdw = jnp.sum(g[0:4] * out[0:4], axis=0, keepdims=True) \
        + jnp.sum(g[5:8] * out[5:8], axis=0, keepdims=True) \
        + 2.0 * g[9:10] * out[9:10] \
        + jnp.sum(g[10:15] * out[10:15], axis=0, keepdims=True)
    dT_F = -g[4:5]                     # alpha channel cotangent: A = 1 - T_F


    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    done_flag[0] = 0

    def body2(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nchunks)
        def _():
            dma_in(jax.lax.rem(ci + 1, 2), ci + 1).start()

        dma_in(slot, ci).wait()

        # latch the flag BEFORE the compute block may update it, so the
        # zero-fill branch never clobbers a freshly computed chunk
        was_done = done_flag[0]

        @pl.when(ci >= 2)
        def _():
            dma_out(slot, ci - 2).wait()

        @pl.when(was_done != 0)
        def _():
            # tile saturated earlier: every remaining gradient is zero,
            # but the slots must still be written (consumed by segment-sum)
            wbuf[slot] = jnp.zeros((DENTRY_F, chunk), jnp.float32)

        @pl.when(was_done == 0)
        def _():
            _bwd_compute(ci, slot)

        dma_out(slot, ci).start()
        return 0

    def _bwd_compute(ci, slot):
        # (ENTRY_F, chunk) wire block → (chunk, ENTRY_F) compute rows
        e = mxu_transpose(ebuf[slot])
        (geom, a_eff, t_mult, cross, T_before, w, live, zs, m) = \
            _recompute_chunk(e, px, py, ci, chunk, count, state)

        # Sanitize geometry BEFORE it enters gradient products: a kept
        # entry with non-finite A/B/C (binning deliberately keeps pairs
        # whose cull coefficients are non-finite) composites as zero in
        # the forward, but 0.0 * NaN = NaN would poison its Gaussian's
        # gradient here and Adam would write NaN params permanently.
        u_s = jnp.where(live, geom.u, 0.0)
        v_s = jnp.where(live, geom.v, 0.0)
        rp2_s = jnp.where(live, geom.rp2, 0.0)

        dw, dm = _dw_terms(e, g, w, live, zs, m, S0, M1_tot, M2_tot)

        # suffix Σ_{j>e} w_j·dw_j = grand total − inclusive prefix
        wdw = w * dw
        P_incl = state[2:3] + prefix_scan_incl(wdw)
        S_wdw = G_wdw - P_incl

        one_m_a = 1.0 - a_eff
        dalpha = T_before * dw - (S_wdw + T_F * dT_F) / one_m_a
        dalpha = jnp.where(live, dalpha, 0.0)

        # median contributor by exact slot identity (forward aux output) —
        # immune to recompute rounding between separately compiled kernels
        ii = jax.lax.broadcasted_iota(jnp.int32, (chunk, TILE_PX), 0)
        is_med = (ci * chunk + ii).astype(jnp.float32) == med_idx

        # dz: expected-depth + median + mapped-depth chain
        dz = w * g[3:4] + jnp.where(is_med, gMed, 0.0) \
            + dm * (M_SCALE * NEAR_N / (zs * zs))
        dz = jnp.where(live, dz, 0.0)

        # alpha → (opacity, rho3d) chain; clamp and low-pass cut the grad
        no_clamp = jnp.logical_not(geom.clamped)
        dopa = jnp.where(live & no_clamp, dalpha * geom.G, 0.0)
        dG = jnp.where(live & no_clamp, dalpha * e[:, 14:15], 0.0)
        drho = -0.5 * geom.G * dG
        use3d = geom.rho3d <= geom.rho2d
        drho3d = jnp.where(use3d, drho, 0.0)

        du = drho3d * 2.0 * u_s + dz * e[:, 9:10]
        dv = drho3d * 2.0 * v_s + dz * e[:, 10:11]
        dp0 = du * rp2_s
        dp1 = dv * rp2_s
        dp2 = -(du * u_s + dv * v_s) * rp2_s

        # reductions over pixels → per-entry gradients (chunk, 1).
        # Measured: doing these as MXU matmuls at f32-exact precision is
        # SLOWER (the operand decomposition costs more than the VPU lane
        # reductions save), so they stay jnp.sum.
        def red(x):
            return jnp.sum(x, axis=1, keepdims=True)

        cols = [
            red(dp0), red(dp1), red(dp2),                    # dA
            red(dp0 * px), red(dp1 * px), red(dp2 * px),     # dB
            red(dp0 * py), red(dp1 * py), red(dp2 * py),     # dC
            red(dz * u_s), red(dz * v_s), red(dz),           # dc2
            red(dopa),                                       # dopacity
            red(w * g[0:1]), red(w * g[1:2]), red(w * g[2:3]),   # drgb
            red(w * g[5:6]), red(w * g[6:7]), red(w * g[7:8]),   # dnormal
            red(w * g[10:11]), red(w * g[11:12]), red(w * g[12:13]),  # dnoise
        ]
        d_chunk = jnp.concatenate(cols, axis=1)           # (chunk, DENTRY_F)
        wbuf[slot] = mxu_transpose(d_chunk)               # → (DENTRY_F, chunk)

        # state updates
        state[2:3] += jnp.sum(wdw, axis=0, keepdims=True)
        state[0:1] = state[0:1] * t_mult
        crossed = jnp.maximum(
            state[1:2], jnp.max(cross.astype(jnp.float32), axis=0,
                                keepdims=True))
        state[1:2] = crossed
        done_flag[0] = (jnp.sum(crossed) >= float(TILE_PX)).astype(jnp.int32)

    jax.lax.fori_loop(0, nchunks, body2, 0)

    @pl.when(nchunks >= 2)
    def _():
        dma_out(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        dma_out(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk",
                                             "interpret"))
def rasterize_bwd_pallas(entries: jnp.ndarray, tile_start: jnp.ndarray,
                         tile_count: jnp.ndarray, out_tiles: jnp.ndarray,
                         g_tiles: jnp.ndarray, med_tiles: jnp.ndarray, *,
                         width: int, height: int, chunk: int = 128,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-entry gradients, chunk-blocked (P_alloc/chunk, DENTRY_F, chunk)
    in the common.py DFLD_* layout — the entry layout minus the two
    always-zero center columns (the low-pass branch carries no gradient)."""
    if not interpret:
        assert chunk % 128 == 0
    assert entries.ndim == 3 and entries.shape[1:] == (ENTRY_F, chunk)
    ntx = cdiv(width, TILE_W)
    T = out_tiles.shape[0]
    n_blocks = entries.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, NUM_OUT, TILE_PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_OUT, TILE_PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_PX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((NUM_STATE, TILE_PX), jnp.float32),
            pltpu.VMEM((2, ENTRY_F, chunk), jnp.float32),
            pltpu.VMEM((2, DENTRY_F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_bwd_kernel, ntx=ntx, chunk=chunk,
                               width=width, height=height)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, DENTRY_F, chunk),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, entries, out_tiles, g_tiles, med_tiles)

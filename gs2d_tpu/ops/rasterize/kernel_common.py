"""Geometry math shared by the forward and backward Pallas kernels.

Operates on a transposed entry chunk ``e`` of shape (chunk, ENTRY_F) and
pixel coordinate rows px, py of shape (1, TILE_PX); all products broadcast
to (chunk, TILE_PX) VPU ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .common import (ALPHA_CLAMP, ALPHA_CUTOFF, FAR_N, FILTER_INV_SQUARE,
                     NEAR_N)

M_SCALE = FAR_N / (FAR_N - NEAR_N)


class ChunkGeom(NamedTuple):
    p2: jnp.ndarray
    p2ok: jnp.ndarray
    rp2: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    rho3d: jnp.ndarray
    rho2d: jnp.ndarray
    G: jnp.ndarray        # exp(-rho/2)
    alpha: jnp.ndarray    # pre-mask alpha (min with clamp)
    clamped: jnp.ndarray  # opa*G hit the 0.99 clamp (no opacity/G grad)
    z: jnp.ndarray        # per-pixel intersection depth


def chunk_geometry(e: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> ChunkGeom:
    p0 = e[:, 0:1] + e[:, 3:4] * px + e[:, 6:7] * py
    p1 = e[:, 1:2] + e[:, 4:5] * px + e[:, 7:8] * py
    p2 = e[:, 2:3] + e[:, 5:6] * px + e[:, 8:9] * py
    p2ok = jnp.abs(p2) > 1e-12
    rp2 = 1.0 / jnp.where(p2ok, p2, 1.0)
    u = p0 * rp2
    v = p1 * rp2
    rho3d = u * u + v * v
    dxp = px - e[:, 12:13]
    dyp = py - e[:, 13:14]
    rho2d = FILTER_INV_SQUARE * (dxp * dxp + dyp * dyp)
    rho = jnp.minimum(rho3d, rho2d)
    G = jnp.exp(-0.5 * rho)
    raw = e[:, 14:15] * G
    clamped = raw >= ALPHA_CLAMP
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    z = u * e[:, 9:10] + v * e[:, 10:11] + e[:, 11:12]
    return ChunkGeom(p2=p2, p2ok=p2ok, rp2=rp2, u=u, v=v, rho3d=rho3d,
                     rho2d=rho2d, G=G, alpha=alpha, clamped=clamped, z=z)


def entry_validity(geom: ChunkGeom, ci, chunk: int, count, crossed_in):
    ridx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    evalid = (ridx + ci * chunk) < count
    return (evalid & geom.p2ok & (geom.z >= NEAR_N)
            & (geom.alpha >= ALPHA_CUTOFF) & (crossed_in < 0.5))


def mapped_depth(z, live):
    zs = jnp.where(live, z, 1.0)
    return zs, M_SCALE * (1.0 - NEAR_N / zs)


def prefix_scan_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 (the splat/chunk axis) of a
    (chunk, TILE_PX) block, as log2(chunk) sublane shift+adds on the VPU.

    This replaces triangular matmuls on the MXU: an f32 matmul needs the
    6-pass HIGHEST-precision decomposition for acceptable accuracy
    (~800 MFLOP per 128-chunk — it dominated the whole kernel), while the
    shift-scan is ~1 MFLOP per chunk AND exact f32.
    """
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < n:
        sh = pltpu.roll(x, shift=d, axis=0)      # sh[i] = x[(i-d) mod n]
        x = x + jnp.where(row >= d, sh, 0.0)
        d *= 2
    return x


def prefix_prod_incl(q: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix PRODUCT along axis 0, as log2(chunk) sublane
    shift+multiplies — the transmittance scan in its native domain.

    The oracle composites T *= (1-alpha) directly
    (oracle.py: test_T = T*(1-alpha) < T_EPS), so the product scan
    matches it bit-closer than the former log-space scan — and drops the
    two transcendentals (log1p on entry, exp on exit) that the log form
    spent per (splat, pixel). q ∈ (0, 1] ⇒ the running product is
    non-increasing; underflow to 0 only happens far past the 1e-4
    early-termination threshold, where the lanes are already frozen.
    """
    n = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
    d = 1
    while d < n:
        sh = pltpu.roll(q, shift=d, axis=0)
        q = q * jnp.where(row >= d, sh, 1.0)
        d *= 2
    return q


def prefix_prod_excl_from_incl(p_incl: jnp.ndarray) -> jnp.ndarray:
    """Exclusive product from the inclusive one: shift down one row,
    seed row 0 with the multiplicative identity (no division — q may
    carry masked-identity 1.0 rows and near-zero alphas)."""
    row = jax.lax.broadcasted_iota(jnp.int32, p_incl.shape, 0)
    return jnp.where(row == 0, 1.0, pltpu.roll(p_incl, shift=1, axis=0))


def mxu_transpose(x: jnp.ndarray) -> jnp.ndarray:
    """(n, m) → (m, n) as one MXU matmul against an identity.

    Mosaic rejects HBM DMA slices whose minor dim is not 128-aligned, so
    the wire format is chunk-blocked (F, chunk) while the compute wants
    (chunk, F); a relayout via jnp.swapaxes is layout-dependent, but an
    identity contraction is always legal. BIT-EXACT even under the bf16x6
    HIGHEST decomposition: the split hi+mid+lo of x is an exact sum, each
    part times 1.0 is exact, and the f32 accumulation of non-overlapping
    parts (plus exact zeros) rounds nowhere.
    """
    n = x.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(x.dtype)
    return jax.lax.dot_general(
        x, eye, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def mxu_dot_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """aᵀ @ b on the MXU (HIGHEST = full f32 via bf16 decomposition):
    contracts dim 0 of both operands — the form the row-major (chunk, F)
    entry layout feeds directly, without a VMEM transpose of the payload
    columns. Offloads the in-kernel channel accumulations to the
    otherwise-idle MXU, overlapping the VPU elementwise pipeline."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

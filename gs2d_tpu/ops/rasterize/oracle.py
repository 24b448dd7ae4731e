"""Pure-jnp reference rasterizer — the spec and test oracle.

Implements exactly the per-pixel compositing contract of the reference CUDA
render kernel (SURVEY.md §2.1 step 3, /root/reference/gaussian_renderer/
__init__.py:97-139 channel contract) as a `lax.scan` over depth-sorted
Gaussians with the whole image as the carry. O(N·H·W) — use only for tests
and tiny scenes. Fully differentiable via jax.grad; the Pallas kernels'
hand-written VJP is verified against this.

Mirrors the upstream test strategy (SURVEY.md §4): the slow-but-obvious
Python rasterizer is the oracle the fast kernels must match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (ALPHA_CLAMP, ALPHA_CUTOFF, FAR_N, FILTER_INV_SQUARE,
                     NEAR_N, NUM_OUT, OUT_ALPHA, OUT_DEPTH, OUT_DIST,
                     OUT_M1, OUT_M2, OUT_MEDIAN, OUT_NOISE, OUT_NORMAL,
                     OUT_RGB, T_EPS, TILE_H, TILE_W, cdiv)
from .preprocess import PreprocessOut


def rasterize_oracle(pre: PreprocessOut, width: int, height: int) -> jnp.ndarray:
    """Composite all Gaussians over every pixel, front to back.

    Returns (NUM_OUT, height, width) float32: rgb(3, background NOT added —
    callers composite ``+ (1-alpha)*bg``), expected-depth sum, alpha,
    view-normal(3), median depth, distortion, noise(3), M1, M2.
    """
    N = pre.A.shape[0]
    # Global front-to-back order: stable argsort on depth with culled
    # Gaussians pushed to the end (matches binning.py's order so per-pixel
    # compositing order is identical to the tiled kernel's).
    depth_key = jnp.where(pre.visible, pre.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")        # (H,W)

    def gather(x):
        return x[order]

    g = jax.tree_util.tree_map(gather, pre)

    ntx = cdiv(width, TILE_W)
    nty = cdiv(height, TILE_H)
    ptx = (px / TILE_W).astype(jnp.int32)   # per-pixel tile coords
    pty = (py / TILE_H).astype(jnp.int32)

    def step(carry, gi):
        (T, done, color, D, Nrm, median, dist, noise, M1, M2, Acc) = carry
        A, B, C, c2, center, ext, opa, rgb, nrm, nz, valid = gi

        p0 = A[0] + px * B[0] + py * C[0]
        p1 = A[1] + px * B[1] + py * C[1]
        p2 = A[2] + px * B[2] + py * C[2]
        p2_ok = jnp.abs(p2) > 1e-12
        p2s = jnp.where(p2_ok, p2, 1.0)
        u = p0 / p2s
        v = p1 / p2s
        rho3d = u * u + v * v
        dx = px - center[0]
        dy = py - center[1]
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
        # low-pass filter carries no gradient (reference README.md:114 note)
        rho = jnp.minimum(rho3d, jax.lax.stop_gradient(rho2d))
        z = u * c2[0] + v * c2[1] + c2[2]

        alpha = jnp.minimum(ALPHA_CLAMP, opa * jnp.exp(-0.5 * rho))
        # tile-granular truncation: the tiled kernel only composites a
        # Gaussian inside its binned tile rectangle (CUDA contract).
        tx0 = jnp.clip(jnp.floor((center[0] - ext[0]) / TILE_W), 0, ntx)
        tx1 = jnp.clip(jnp.floor((center[0] + ext[0]) / TILE_W) + 1, 0, ntx)
        ty0 = jnp.clip(jnp.floor((center[1] - ext[1]) / TILE_H), 0, nty)
        ty1 = jnp.clip(jnp.floor((center[1] + ext[1]) / TILE_H) + 1, 0, nty)
        in_rect = ((ptx >= tx0) & (ptx < tx1) & (pty >= ty0) & (pty < ty1))
        ok = (valid & in_rect & p2_ok & (z >= NEAR_N)
              & (alpha >= ALPHA_CUTOFF) & (~done))
        test_T = T * (1.0 - alpha)
        crossing = ok & (test_T < T_EPS)
        ok = ok & (~crossing)
        done = done | crossing
        a = jnp.where(ok, alpha, 0.0)

        w = a * T
        zs = jnp.where(ok, z, 1.0)
        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / zs)
        dist = dist + (m * m * Acc + M2 - 2.0 * m * M1) * w
        median = jnp.where(ok & (T > 0.5), z, median)
        color = color + rgb[:, None, None] * w[None]
        D = D + z * w
        Nrm = Nrm + nrm[:, None, None] * w[None]
        noise = noise + nz[:, None, None] * w[None]
        M1 = M1 + m * w
        M2 = M2 + m * m * w
        Acc = Acc + w
        T = T * (1.0 - a)
        return (T, done, color, D, Nrm, median, dist, noise, M1, M2, Acc), None

    H, W = height, width
    z2 = jnp.zeros((H, W), jnp.float32)
    z3 = jnp.zeros((3, H, W), jnp.float32)
    init = (jnp.ones((H, W), jnp.float32), jnp.zeros((H, W), bool),
            z3, z2, z3, z2, z2, z3, z2, z2, z2)
    xs_in = (g.A, g.B, g.C, g.c2, g.center2d, g.extent, g.opacity, g.rgb,
             g.normal, g.noise, g.visible)
    (T, done, color, D, Nrm, median, dist, noise, M1, M2, Acc), _ = \
        jax.lax.scan(step, init, xs_in)

    out = jnp.zeros((NUM_OUT, H, W), jnp.float32)
    out = out.at[OUT_RGB].set(color)
    out = out.at[OUT_DEPTH].set(D)
    out = out.at[OUT_ALPHA].set(1.0 - T)
    out = out.at[OUT_NORMAL].set(Nrm)
    out = out.at[OUT_MEDIAN].set(median)
    out = out.at[OUT_DIST].set(dist)
    out = out.at[OUT_NOISE].set(noise)
    out = out.at[OUT_M1].set(M1)
    out = out.at[OUT_M2].set(M2)
    return out

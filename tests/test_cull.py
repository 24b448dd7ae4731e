"""Contribution culling via the per-row conservative intervals.

Binning expands each Gaussian into per-tile-row x-intervals of its
support (bin_gaussians level 1) instead of full bbox rows. The cull may
only drop (gaussian, tile) pairs with zero kernel contribution. Three
guarantees are tested:

  * exactness — every dropped pair's max alpha over its tile's pixels
    (evaluated with the kernels' own per-pixel formula) is below
    ALPHA_CUTOFF, so the kernel would never have composited it;
  * conservatism — every pair the exact per-tile oracle
    (binning._pair_contributes, the continuous rect-min test) keeps is
    present in the interval-culled tile lists;
  * image stability — the culled image matches the un-culled one to
    f32 re-association noise (dropping a zero-contribution entry shifts
    later entries' slots, which changes the summation tree inside the
    kernels' chunk prefix scans — bit-identity is not expected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.ops.rasterize.api import (RasterizeConfig, rasterize,
                                        suggest_capacities)
from gs2d_tpu.ops.rasterize.binning import _pair_contributes, bin_gaussians
from gs2d_tpu.ops.rasterize.common import (ALPHA_CUTOFF, FILTER_INV_SQUARE,
                                           TILE_H, TILE_W, cdiv)
from gs2d_tpu.ops.rasterize.preprocess import preprocess
from tests.utils import lookat_camera, random_cloud


def _pre(n=400, seed=0, w=128, h=96, opacity_lo=0.003):
    cam = lookat_camera(w, h)
    means, scales, quats, opac, rgb, _ = random_cloud(
        n, seed=seed, scale_lo=0.01, scale_hi=0.4)
    rng = np.random.default_rng(seed + 1)
    opac = rng.uniform(opacity_lo, 0.95, (n,)).astype(np.float32)
    return preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
        w, h, colors=jnp.asarray(rgb)), cam


def _tile_gid_sets(b, T):
    start = np.asarray(b.tile_start)
    count = np.asarray(b.tile_count)
    gid = np.asarray(b.gid)
    return [set(gid[start[t]:start[t] + count[t]].tolist()) for t in range(T)]


def test_cull_image_close_and_cuts():
    pre, cam = _pre()
    w, h = 128, 96
    base = RasterizeConfig(width=w, height=h, pairs_capacity=1 << 15,
                           interpret=True, cull=False)
    culled = RasterizeConfig(width=w, height=h, pairs_capacity=1 << 15,
                             final_capacity=1 << 15, interpret=True,
                             cull=True)
    out0, aux0 = rasterize(pre, base)
    out1, aux1 = rasterize(pre, culled)
    assert not bool(aux0["overflow"]) and not bool(aux1["overflow"])
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=5e-6, rtol=0)
    # low-opacity + anisotropic scene: the intervals must actually cut
    # expansion demand below the bbox demand (aux0 expands full rects)
    assert int(aux1["num_expanded"]) < int(aux0["num_expanded"])


def test_dropped_pairs_never_composite():
    """Every pair present un-culled but absent culled has max alpha over
    its tile's pixels (kernel formula, f32) strictly below ALPHA_CUTOFF."""
    pre, cam = _pre()
    w, h = 128, 96
    b0 = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                       w, h, 1 << 15, 128)
    b1 = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                       w, h, 1 << 15, 128,
                       cull_abc=(pre.A, pre.B, pre.C),
                       rho2max=pre.rho2max, final_capacity=1 << 15)
    ntx, nty = cdiv(w, TILE_W), cdiv(h, TILE_H)
    T = ntx * nty
    sets0, sets1 = _tile_gid_sets(b0, T), _tile_gid_sets(b1, T)
    A = np.asarray(pre.A, np.float32)
    B = np.asarray(pre.B, np.float32)
    C = np.asarray(pre.C, np.float32)
    c2d = np.asarray(pre.center2d)
    op = np.asarray(pre.opacity)
    n_dropped = 0
    for t in range(T):
        assert sets1[t] <= sets0[t], "cull added a pair"
        dropped = sets0[t] - sets1[t]
        n_dropped += len(dropped)
        if not dropped:
            continue
        ty_, tx_ = t // ntx, t % ntx
        xs = np.arange(tx_ * TILE_W, tx_ * TILE_W + TILE_W, dtype=np.float32)
        ys = np.arange(ty_ * TILE_H, ty_ * TILE_H + TILE_H, dtype=np.float32)
        X, Y = np.meshgrid(np.minimum(xs, w - 1.0), np.minimum(ys, h - 1.0))
        for g in dropped:
            p0 = A[g, 0] + B[g, 0] * X + C[g, 0] * Y
            p1 = A[g, 1] + B[g, 1] * X + C[g, 1] * Y
            p2 = A[g, 2] + B[g, 2] * X + C[g, 2] * Y
            p2ok = np.abs(p2) > 1e-12
            rp2 = 1.0 / np.where(p2ok, p2, 1.0)
            rho3d = (p0 * rp2) ** 2 + (p1 * rp2) ** 2
            rho2d = FILTER_INV_SQUARE * ((X - c2d[g, 0]) ** 2
                                         + (Y - c2d[g, 1]) ** 2)
            alpha = np.where(p2ok,
                             op[g] * np.exp(-0.5 * np.minimum(rho3d, rho2d)),
                             0.0)
            assert alpha.max() < ALPHA_CUTOFF, \
                f"dropped pair (g={g}, t={t}) composites: " \
                f"alpha {alpha.max()}"
    assert n_dropped > 0, "scene produced no cullable pairs"


def test_intervals_contain_exact_keep_set():
    """Conservatism: the interval-culled tile lists are a superset of
    what the exact per-tile oracle keeps — the row intervals (inflated
    chords + margins, full-width fallback when ill-conditioned) may add
    tiles but never drop one the continuous rect-min test would keep."""
    for seed in (0, 1, 2):
        pre, cam = _pre(seed=seed, opacity_lo=0.002)
        w, h = 128, 96
        b0 = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                           w, h, 1 << 15, 128)
        b1 = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                           w, h, 1 << 15, 128,
                           cull_abc=(pre.A, pre.B, pre.C),
                           rho2max=pre.rho2max, final_capacity=1 << 15)
        assert not bool(b0.overflow) and not bool(b1.overflow)
        ntx, nty = cdiv(w, TILE_W), cdiv(h, TILE_H)
        T = ntx * nty
        sets0, sets1 = _tile_gid_sets(b0, T), _tile_gid_sets(b1, T)
        # exact oracle per (pair in bbox): evaluate _pair_contributes
        A, B, C = pre.A, pre.B, pre.C
        c2d = np.asarray(pre.center2d)
        r2m = np.asarray(pre.rho2max)
        grec = jnp.concatenate(
            [jnp.zeros((A.shape[0], 5), jnp.float32), A, B, C,
             jnp.stack([jnp.asarray(c2d[:, 0]), jnp.asarray(c2d[:, 1]),
                        jnp.asarray(r2m)], axis=1)], axis=1)
        n_checked = 0
        for t in range(T):
            cand = sorted(sets0[t])
            if not cand:
                continue
            gi = jnp.asarray(cand, jnp.int32)
            keep = np.asarray(_pair_contributes(
                lambda c: grec[gi, c],
                jnp.full((len(cand),), t % ntx, jnp.int32),
                jnp.full((len(cand),), t // ntx, jnp.int32), w, h))
            for g, k in zip(cand, keep):
                if k:
                    n_checked += 1
                    assert g in sets1[t], \
                        f"seed {seed}: exact-keep pair (g={g}, t={t}) " \
                        "missing from interval lists"
        assert n_checked > 100


def test_cull_shrinks_final_capacity():
    pre, cam = _pre(opacity_lo=0.002)
    cap, fin, rows = suggest_capacities(pre, 128, 96)
    assert fin <= cap
    assert rows <= cap
    bins = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                         128, 96, cap, 128,
                         cull_abc=(pre.A, pre.B, pre.C),
                         rho2max=pre.rho2max, final_capacity=fin,
                         rows_capacity=rows)
    assert not bool(bins.overflow)
    assert int(bins.num_pairs) <= int(bins.num_expanded)


def test_rect_min_lower_bounds_pixels():
    """_pair_contributes keeps every pair whose tile holds a contributing
    pixel: its continuous rect-min of Q lower-bounds the discrete pixel
    min of rho3d-vs-rho2max (and rho2d likewise)."""
    rng = np.random.default_rng(3)
    n = 512
    A = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    B = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    C = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    cx = rng.uniform(-10, 70, n).astype(np.float32)
    cy = rng.uniform(-10, 50, n).astype(np.float32)
    r2m = rng.uniform(0.1, 11.0, n).astype(np.float32)
    # column layout: [start_hi, start_lo, rw, tx0, ty0,
    #                 A0..2, B0..2, C0..2, cx, cy, r2m]
    grec = jnp.concatenate(
        [jnp.zeros((n, 5), jnp.float32),
         jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
         jnp.stack([jnp.asarray(cx), jnp.asarray(cy),
                    jnp.asarray(r2m)], axis=1)], axis=1)
    tx = jnp.ones((n,), jnp.int32)
    ty = jnp.ones((n,), jnp.int32)
    keep = np.asarray(_pair_contributes(
        lambda c: grec[:, c], tx, ty, 1920, 1080))

    xs = (np.arange(TILE_W) + TILE_W).astype(np.float32)
    ys = (np.arange(TILE_H) + TILE_H).astype(np.float32)
    X, Y = np.meshgrid(xs, ys)
    n_contrib = 0
    for i in range(n):
        p0 = A[i, 0] + B[i, 0] * X + C[i, 0] * Y
        p1 = A[i, 1] + B[i, 1] * X + C[i, 1] * Y
        p2 = A[i, 2] + B[i, 2] * X + C[i, 2] * Y
        Q = p0 * p0 + p1 * p1 - r2m[i] * p2 * p2
        d2 = FILTER_INV_SQUARE * ((X - cx[i]) ** 2 + (Y - cy[i]) ** 2)
        contributes = bool(np.any(Q <= 0.0) or np.any(d2 <= r2m[i]))
        if contributes:
            n_contrib += 1
            assert keep[i], f"pair {i} dropped but contributes"
    assert n_contrib > 10  # the random family must exercise the keep side


if __name__ == "__main__":
    pytest.main([__file__, "-v"])

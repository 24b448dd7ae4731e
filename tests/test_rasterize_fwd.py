"""Forward rasterizer: oracle sanity + Pallas-vs-oracle parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from gs2d_tpu.ops.rasterize.common import (OUT_ALPHA, OUT_DEPTH, OUT_DIST,
                                           OUT_MEDIAN, OUT_RGB)
from gs2d_tpu.ops.rasterize.oracle import rasterize_oracle
from gs2d_tpu.ops.rasterize.preprocess import preprocess

from .utils import lookat_camera, random_cloud


def _pre(cam, n=200, seed=0, opaque=None, **kw):
    means, scales, quats, opac, rgb, noise = random_cloud(n, seed, **kw)
    if opaque is not None:
        opac = np.full_like(opac, opaque)
    return preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), cam.world_view, cam.full_proj, cam.campos,
        cam.width, cam.height, colors=jnp.asarray(rgb),
        noise=jnp.asarray(noise))


def test_oracle_single_splat_center():
    """A large opaque splat at the origin must dominate the image center."""
    cam = lookat_camera(width=128, height=64)
    means = jnp.array([[0.0, 0.0, 0.0]])
    scales = jnp.array([[0.5, 0.5]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.99])
    rgb = jnp.array([[1.0, 0.0, 0.0]])
    pre = preprocess(means, scales, quats, opac, cam.world_view,
                     cam.full_proj, cam.campos, cam.width, cam.height,
                     colors=rgb)
    out = rasterize_oracle(pre, cam.width, cam.height)
    cx, cy = 63, 32  # (W-1)/2-ish center
    assert out[OUT_ALPHA, cy, cx] > 0.9
    assert out[OUT_RGB.start, cy, cx] > 0.9
    # depth ≈ 4 (camera at z=-4 looking at origin)
    d = out[OUT_DEPTH, cy, cx] / out[OUT_ALPHA, cy, cx]
    assert abs(float(d) - 4.0) < 0.05
    assert abs(float(out[OUT_MEDIAN, cy, cx]) - 4.0) < 0.05
    # corners empty
    assert out[OUT_ALPHA, 0, 0] < 1e-3


def test_oracle_depth_order_invariance():
    """Shuffling input order must not change the composite (depth sort)."""
    cam = lookat_camera()
    means, scales, quats, opac, rgb, noise = random_cloud(50, 3)
    perm = np.random.default_rng(1).permutation(50)

    def run(ms, sc, qu, op, cl):
        pre = preprocess(jnp.asarray(ms), jnp.asarray(sc), jnp.asarray(qu),
                         jnp.asarray(op), cam.world_view, cam.full_proj,
                         cam.campos, cam.width, cam.height,
                         colors=jnp.asarray(cl))
        return rasterize_oracle(pre, cam.width, cam.height)

    a = run(means, scales, quats, opac, rgb)
    b = run(means[perm], scales[perm], quats[perm], opac[perm], rgb[perm])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed,n,opaque", [(0, 200, None), (1, 500, None),
                                           (2, 100, 0.95), (5, 37, None)])
def test_pallas_matches_oracle(seed, n, opaque):
    cam = lookat_camera(width=256, height=128)
    pre = _pre(cam, n=n, seed=seed, opaque=opaque)
    ref = rasterize_oracle(pre, cam.width, cam.height)
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 14, chunk=16, interpret=True)
    out, aux = rasterize(pre, cfg)
    assert not bool(aux["overflow"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_heavy_occlusion_early_exit():
    """Many opaque overlapping splats — exercises the crossing freeze."""
    cam = lookat_camera(width=128, height=64)
    pre = _pre(cam, n=300, seed=7, opaque=0.99, spread=0.3,
               scale_lo=0.2, scale_hi=0.5)
    ref = rasterize_oracle(pre, cam.width, cam.height)
    cfg = RasterizeConfig(width=cam.width, height=cam.height,
                          pairs_capacity=1 << 14, chunk=16, interpret=True)
    out, aux = rasterize(pre, cfg)
    assert not bool(aux["overflow"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_all_culled_scene_renders_empty():
    """Every Gaussian behind the camera: alpha 0 everywhere, no NaNs
    (the empty-tile path exercises zero-chunk DMA loops). The camera sits
    at world z=-4 looking toward +z, so z=-50 is behind it."""
    cam = lookat_camera(width=64, height=32)
    means = jnp.asarray(np.full((16, 3), [0.0, 0.0, -50.0], np.float32))
    scales = jnp.full((16, 2), 0.1, jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (16, 1))
    opac = jnp.full((16,), 0.9, jnp.float32)
    rgb = jnp.full((16, 3), 0.5, jnp.float32)
    pre = preprocess(means, scales, quats, opac, cam.world_view,
                     cam.full_proj, cam.campos, 64, 32, colors=rgb)
    cfg = RasterizeConfig(width=64, height=32, pairs_capacity=1 << 10,
                          chunk=16, interpret=True)
    out, aux = rasterize(pre, cfg)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    np.testing.assert_allclose(o[4], 0.0, atol=1e-7)   # alpha
    np.testing.assert_allclose(o[0:3], 0.0, atol=1e-7)  # rgb
    assert int(aux["num_pairs"]) == 0


def test_suggest_pairs_capacity_tight_and_sufficient():
    from gs2d_tpu.ops.rasterize.api import suggest_pairs_capacity
    cam = lookat_camera(width=128, height=64)
    means, scales, quats, opac, rgb, noise = random_cloud(200, 1)
    pre = preprocess(jnp.asarray(means), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac),
                     cam.world_view, cam.full_proj, cam.campos, 128, 64,
                     colors=jnp.asarray(rgb))
    cap = suggest_pairs_capacity(pre, 128, 64, chunk=16,
                                 probe_capacity=1 << 14)
    assert cap % 16 == 0
    cfg = RasterizeConfig(width=128, height=64, pairs_capacity=cap,
                          chunk=16, interpret=True)
    out, aux = rasterize(pre, cfg)
    assert not bool(aux["overflow"])
    # tight: within 2x of the padded demand measured by a huge-capacity run
    from gs2d_tpu.ops.rasterize.binning import bin_gaussians
    bins = bin_gaussians(pre.center2d, pre.extent, pre.depth, pre.visible,
                         128, 64, 1 << 14, 16)
    assert cap <= 2 * int(bins.padded_total) + 16


def test_normal_maps_alignment_convention():
    """rend_normal (splat normals composited in view space, rotated to
    world) and surf_normal (depth-map cross products, alpha-weighted) must
    FACE THE SAME WAY — the normal-consistency loss
    1 − Σ_c rend·surf (train/step.py) only regularizes geometry if the two
    conventions agree; a sign flip would push splats to 180° instead.
    Flat wall facing the camera: positive dot, both pointing at the
    camera (−z here)."""
    from gs2d_tpu.models.gaussians import init_from_pcd
    from gs2d_tpu.render.renderer import render

    n = 14
    g = np.linspace(-1.2, 1.2, n, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    means = np.stack([xx.ravel(), yy.ravel(),
                      np.zeros(n * n, np.float32)], -1)
    rgb = np.full((n * n, 3), 0.7, np.float32)
    state = init_from_pcd(
        means, rgb, 256,
        init_scales=np.log(np.full((n * n, 2), 0.35, np.float32)))
    cam = lookat_camera(width=128, height=128)
    cfg = RasterizeConfig(width=128, height=128, pairs_capacity=1 << 13,
                          chunk=16, interpret=True)
    pkg = render(cam, state, cfg, jnp.zeros(3))
    a = np.asarray(pkg["rend_alpha"])[0]
    rn = np.asarray(pkg["rend_normal"])
    sn = np.asarray(pkg["surf_normal"])
    inner = a > 0.3 * a.max()
    inner[:2] = inner[-2:] = False
    inner[:, :2] = inner[:, -2:] = False
    assert inner.sum() > 1000
    dot = (rn * sn).sum(0)[inner]
    # aligned (positive) for ~every covered pixel, solidly on average
    assert (dot > 0).mean() > 0.99
    assert dot.mean() > 0.1
    # both face the camera: camera looks toward +z, normals point −z
    assert rn[2][inner].mean() < -0.1
    assert sn[2][inner].mean() < -0.1

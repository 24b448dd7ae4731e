"""Unit coverage for scripts/quality_readout.py's scoring pieces.

The at-scale quality artifact (QUALITY_scale.json) depends on chamfer()
— which took a cKDTree fast path in round 5 — and on the analytic GT
surface sampler. Pin the fast path to the original blockwise
definition and the sampler to its on-surface contract.
Reference role: /root/reference/scripts/dtu_eval.py:24-52 (train →
render → score is the reference's implicit test of quality).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import quality_readout as qr


def _blockwise(a, b, block=512):
    def one_way(x, y):
        mins = np.empty(len(x), np.float32)
        for i in range(0, len(x), block):
            d = ((x[i:i + block, None, :] - y[None, :, :]) ** 2).sum(-1)
            mins[i:i + block] = d.min(1)
        return np.sqrt(mins).mean()
    return float(one_way(a, b)), float(one_way(b, a))


def test_chamfer_kdtree_matches_blockwise():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(700, 3)).astype(np.float32)
    b = (rng.normal(size=(900, 3)) * 0.7 + 0.1).astype(np.float32)
    d_ab, d_ba = qr.chamfer(a, b)
    r_ab, r_ba = _blockwise(a, b)
    assert abs(d_ab - r_ab) < 1e-5
    assert abs(d_ba - r_ba) < 1e-5


def test_chamfer_zero_on_identical_sets():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(300, 3)).astype(np.float32)
    d_ab, d_ba = qr.chamfer(a, a.copy())
    assert d_ab == 0.0 and d_ba == 0.0


def test_gt_surface_points_lie_on_scene_surfaces():
    """The readout's GT samples are surfel CENTERS of the analytic rich
    scene — every foreground point must sit on the torus (R=1.0,
    r=0.35) or the ground disc (z = -0.4), the same surfaces the
    trained mesh is scored against."""
    pts = qr.gt_surface_points(n=20_000, seed=7)
    fg = pts[np.linalg.norm(pts, axis=1) < 1.6]
    assert len(fg) > 1000
    rho = np.hypot(pts[:, 0], pts[:, 1])
    torus_err = np.abs(np.hypot(rho - 1.0, pts[:, 2]) - 0.35)
    disc_err = np.abs(pts[:, 2] + 0.4)
    on_surface = np.minimum(torus_err, disc_err)[
        np.linalg.norm(pts, axis=1) < 1.6]
    assert float(on_surface.max()) < 1e-3

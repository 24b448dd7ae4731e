"""Geometry eval primitives: sampling, chamfer, F1, ICP."""

import numpy as np

from gs2d_tpu.eval.geometry import (chamfer_distance, fscore,
                                    icp_point_to_point, sample_mesh_points,
                                    thin_points)
from gs2d_tpu.ops.marching import marching_tets


def _sphere_mesh(r=0.5, n=40):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - r
    return marching_tets(sdf, origin=np.array([-1.0, -1, -1]),
                         voxel_size=xs[1] - xs[0])


def test_sample_mesh_points_on_surface():
    verts, faces = _sphere_mesh()
    pts = sample_mesh_points(verts, faces, 20000)
    radii = np.linalg.norm(pts, axis=-1)
    assert abs(radii.mean() - 0.5) < 0.02


def test_chamfer_identical_and_offset():
    verts, faces = _sphere_mesh()
    a = sample_mesh_points(verts, faces, 5000, seed=0)
    b = sample_mesh_points(verts, faces, 5000, seed=1)
    d2s, s2d = chamfer_distance(a, b)
    assert d2s < 0.03 and s2d < 0.03
    d2s2, _ = chamfer_distance(a + np.array([0.2, 0, 0]), b)
    assert d2s2 > 0.05


def test_fscore_thresholds():
    rng = np.random.default_rng(0)
    gt = rng.random((2000, 3))
    rec = gt + rng.normal(scale=0.002, size=gt.shape)
    r = fscore(rec, gt, threshold=0.01)
    assert r["fscore"] > 0.95
    r2 = fscore(rec + 0.5, gt, threshold=0.01)
    assert r2["fscore"] < 0.05


def test_icp_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    src = rng.random((3000, 3))
    ang = 0.1
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.05, -0.02, 0.03])
    dst = src @ R.T + t
    T = icp_point_to_point(src, dst, max_corr_dist=0.3)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


def test_thin_points_density():
    rng = np.random.default_rng(0)
    pts = rng.random((3000, 3)) * 0.2
    thin = thin_points(pts, 0.05)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(thin).query(thin, k=2)
    assert d[:, 1].min() >= 0.05 - 1e-9

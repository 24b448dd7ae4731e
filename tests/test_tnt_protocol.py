"""TnT protocol fixture tests (VERDICT r1 item 5).

A synthetic two-cloud fixture with a known similarity transform drives
every stage of gs2d_tpu/eval/tnt.py: .log trajectory IO, RANSAC
camera-center alignment, crop volume, the three-stage ICP refinement,
and EvaluateHisto — asserting the pipeline recovers the transform, the
crop volume excludes out-of-volume floaters, and the histogram/plot
outputs land on disk.
"""

import json
import os

import numpy as np
import pytest

from gs2d_tpu.eval import tnt
from gs2d_tpu.scene.ply import write_mesh_ply, write_point_cloud


def _sphere_mesh(nt=60, np_=30, r=1.0, center=(0, 0, 0)):
    th = np.linspace(0, 2 * np.pi, nt, endpoint=False)
    ph = np.linspace(1e-3, np.pi - 1e-3, np_)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([r * np.cos(T) * np.sin(P), r * np.sin(T) * np.sin(P),
                  r * np.cos(P)], -1).reshape(-1, 3) + np.asarray(center)
    idx = np.arange(nt * np_).reshape(nt, np_)
    f = []
    for i in range(nt):
        for j in range(np_ - 1):
            a, b = idx[i, j], idx[(i + 1) % nt, j]
            c, d = idx[(i + 1) % nt, j + 1], idx[i, j + 1]
            f += [[a, b, c], [a, c, d]]
    return v, np.asarray(f)


def _T_true():
    s = 1.7
    ang = np.radians(30)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    T = np.eye(4)
    T[:3, :3] = s * R
    T[:3, 3] = [3.0, -2.0, 1.0]
    return T


def _apply(T, p):
    return p @ T[:3, :3].T + T[:3, 3]


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    T = _T_true()
    dst = _apply(T, src)
    np.testing.assert_allclose(tnt.umeyama(src, dst), T, atol=1e-9)


def test_trajectory_log_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4), (7, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(7, 3))
    p = tmp_path / "t.log"
    tnt.write_trajectory_log(str(p), poses)
    np.testing.assert_allclose(tnt.read_trajectory_log(str(p)), poses,
                               atol=1e-10)


def test_mapping_sparsification(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("3\n10\n1 2\n2 5\n3 9\n")
    n_s, n_t, mapping = tnt.read_mapping(str(p))
    assert (n_s, n_t) == (3, 10)
    poses = np.arange(10)[:, None, None] * np.ones((10, 4, 4))
    sp = tnt.sparse_trajectory(mapping, poses)
    assert [int(x[0, 0]) for x in sp] == [1, 4, 8]


def test_selection_volume():
    vol = tnt.SelectionVolume("Z", -1.0, 1.0, np.array(
        [[-2.0, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]]))
    pts = np.array([[0, 0, 0], [0, 0, 2.0], [3.0, 0, 0], [1.9, 1.9, 0.9]])
    np.testing.assert_array_equal(vol.contains(pts),
                                  [True, False, False, True])


def test_voxel_downsample_is_mean():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.0, 5, 5]])
    out = tnt.voxel_downsample(pts, 1.0)
    assert len(out) == 2
    got = out[np.lexsort(out.T)]
    np.testing.assert_allclose(got[0], [0.2, 0.2, 0.2])


def _write_fixture(tmp_path):
    """Courthouse-named fixture (τ=0.025): GT sphere cloud + trajectories
    + crop volume; the reconstruction mesh (+ optional floater) lives in
    the EST frame, related to GT by _T_true(). Cloud densities are chosen
    so NN spacing << τ, as in the real datasets (GT spacing ~0.005,
    rec verts+centers ~0.013 on the unit sphere)."""
    d = tmp_path / "Courthouse"
    d.mkdir()
    rng = np.random.default_rng(3)
    # GT cloud: uniform samples of the unit sphere surface
    g = rng.normal(size=(100000, 3))
    gt = g / np.linalg.norm(g, axis=-1, keepdims=True)
    write_point_cloud(str(d / "Courthouse.ply"), gt, np.full_like(gt, 0.5))
    np.savetxt(str(d / "Courthouse_trans.txt"), np.eye(4))
    # GT trajectory: ring of cameras at radius 3 in the GT frame
    ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    centers_gt = np.stack([3 * np.cos(ang), 3 * np.sin(ang),
                           0.5 + 0 * ang], -1)
    poses_gt = np.tile(np.eye(4), (40, 1, 1))
    poses_gt[:, :3, 3] = centers_gt
    tnt.write_trajectory_log(str(d / "Courthouse_COLMAP_SfM.log"), poses_gt)
    # crop volume: generous box around the sphere only
    with open(d / "Courthouse.json", "w") as f:
        json.dump({"orthogonal_axis": "Z", "axis_min": -1.5,
                   "axis_max": 1.5,
                   "bounding_polygon": [[-1.5, -1.5, 0], [1.5, -1.5, 0],
                                        [1.5, 1.5, 0], [-1.5, 1.5, 0]]},
                  f)
    # estimated trajectory: same cameras expressed in the EST frame + noise
    Tinv = np.linalg.inv(_T_true())
    poses_est = np.tile(np.eye(4), (40, 1, 1))
    poses_est[:, :3, 3] = _apply(Tinv, centers_gt) + \
        0.005 * rng.standard_normal((40, 3))
    traj = str(tmp_path / "est_traj.log")
    tnt.write_trajectory_log(traj, poses_est)
    return str(d), traj


def test_full_pipeline_recovers_alignment(tmp_path):
    d, traj = _write_fixture(tmp_path)
    Tinv = np.linalg.inv(_T_true())
    sv, sf = _sphere_mesh(nt=240, np_=120)
    # floater OUTSIDE the crop volume (GT-frame x=4), inside nothing
    fv, ff = _sphere_mesh(nt=48, np_=24, r=0.5, center=(4.0, 0, 0))
    verts = np.concatenate([_apply(Tinv, sv), _apply(Tinv, fv)])
    faces = np.concatenate([sf, ff + len(sv)])
    mesh = str(tmp_path / "rec.ply")
    write_mesh_ply(mesh, verts, faces)

    out_dir = str(tmp_path / "out")
    res = tnt.run_tnt_evaluation(mesh, d, traj, out_dir, scene="Courthouse")

    # alignment recovered to a fraction of τ
    T = res["transform"]
    pts = np.random.default_rng(5).normal(size=(100, 3))
    err = np.linalg.norm(_apply(T, _apply(Tinv, pts)) - pts, axis=-1)
    assert err.max() < 0.03, err.max()
    # crop removed the floater → near-perfect scores at τ=0.01
    assert res["precision"] > 0.97
    assert res["recall"] > 0.97
    assert res["fscore"] > 0.97
    # protocol outputs on disk (histograms + plot, evaluation.py:186-196)
    for fn in ("Courthouse.precision.txt", "Courthouse.recall.txt",
               "Courthouse.prf_tau_plotstr.txt",
               "Courthouse.precision_recall.png"):
        assert os.path.exists(os.path.join(out_dir, fn)), fn

    # without the crop volume the floater must hurt precision
    from gs2d_tpu.scene.ply import read_point_cloud
    rec = tnt.mesh_eval_points(verts, faces)
    gt, _, _ = read_point_cloud(os.path.join(d, "Courthouse.ply"))
    nocrop = tnt.evaluate_histo(rec, gt, T, None, 0.0125, 0.025)
    assert nocrop["precision"] < res["precision"] - 0.02

"""DTU harness fixture test (VERDICT r1 item 3).

Drives scripts/dtu_eval.py end-to-end (subprocess, --skip_training
--skip_rendering) on a synthetic fixture: an object mesh plus a floater
blob, two IDR cameras + foreground masks, an all-pass ObsMask, and GT
points on the object. The reference protocol
(eval_dtu/evaluate_single_scene.py:19-101) culls the mesh by dilated
per-view masks BEFORE chamfer sampling — so the masked run must score
strictly better than the unmasked run (the floater survives only without
masks), and the masked chamfer must be near zero.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
sio = pytest.importorskip("scipy.io")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from gs2d_tpu.scene.ply import write_mesh_ply, write_point_cloud  # noqa: E402

W, H = 320, 240
FX = 200.0
SCALE, OFFSET = 2.0, np.array([10.0, 20.0, 30.0])


def _cube(center, r):
    c = np.asarray(center, np.float64)
    v = np.array([[x, y, z] for x in (-r, r) for y in (-r, r)
                  for z in (-r, r)]) + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def _cameras():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float64)
    # view A: camera at +z looking back at the origin
    RA = np.diag([1.0, -1.0, -1.0])
    CA = np.array([0.0, 0.0, 2.0])
    # view B: camera at +x looking back at the origin
    RB = np.array([[0.0, 0, -1], [0, -1, 0], [-1, 0, 0]])
    CB = np.array([2.0, 0.0, 0.0])
    views = []
    for R, C in ((RA, CA), (RB, CB)):
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = -R @ C
        views.append((K, w2c))
    return views


def _write_fixture(root, with_masks=True):
    scan = os.path.join(root, "scan24")
    os.makedirs(os.path.join(scan, "mask"), exist_ok=True)
    views = _cameras()
    scale_mat = np.eye(4)
    scale_mat[:3, :3] *= SCALE
    scale_mat[:3, 3] = OFFSET
    cams = {}
    for i, (K, w2c) in enumerate(views):
        P4 = np.eye(4)
        P4[:3, :4] = K @ w2c[:3, :4]
        cams[f"world_mat_{i}"] = P4 @ np.linalg.inv(scale_mat)
        cams[f"scale_mat_{i}"] = scale_mat
    np.savez(os.path.join(scan, "cameras.npz"), **cams)
    if with_masks:
        for i in range(len(views)):
            m = np.zeros((H, W), np.uint8)
            cv2.circle(m, (W // 2, H // 2), 45, 255, -1)
            cv2.imwrite(os.path.join(scan, "mask", f"{i:03d}.png"), m)
    return scan


def _write_model_out(out_root, verts, faces):
    out = os.path.join(out_root, "scan24")
    os.makedirs(os.path.join(out, "point_cloud", "iteration_30000"),
                exist_ok=True)
    mesh_dir = os.path.join(out, "train", "ours_30000")
    os.makedirs(mesh_dir, exist_ok=True)
    write_mesh_ply(os.path.join(mesh_dir, "fuse_post.ply"), verts, faces)


def _write_official(root, gt_world):
    os.makedirs(os.path.join(root, "Points", "stl"), exist_ok=True)
    os.makedirs(os.path.join(root, "ObsMask"), exist_ok=True)
    write_point_cloud(os.path.join(root, "Points", "stl",
                                   "stl024_total.ply"), gt_world,
                      np.full_like(gt_world, 0.5))
    res = 0.5
    bb = np.stack([OFFSET - 3 * SCALE, OFFSET + 3 * SCALE])
    shape = np.ceil((bb[1] - bb[0]) / res).astype(int)
    sio.savemat(os.path.join(root, "ObsMask", "ObsMask24_10.mat"),
                {"ObsMask": np.ones(shape, np.uint8), "BB": bb,
                 "Res": res, "P": np.array([[0.0], [0], [0], [1]])})


def _run_harness(dtu_root, official_root, out_root):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dtu_eval.py"),
         "--dtu", dtu_root, "--DTU", official_root, "-o", out_root,
         "--scans", "24", "--skip_training", "--skip_rendering"],
        check=True, env=env, cwd=REPO, timeout=600)
    with open(os.path.join(out_root, "results.json")) as f:
        return json.load(f)


def test_dtu_harness_mask_culling(tmp_path):
    # object cube (inside every mask) + floater (outside the dilated mask
    # in both views, but inside both image frustums)
    ov, of = _cube([0, 0, 0], 0.3)
    fv, ff = _cube([0.9, 0.5, 0.3], 0.12)
    verts = np.concatenate([ov, fv])
    faces = np.concatenate([of, ff + len(ov)])

    # GT = dense samples of the object surface, in the GT world frame
    from gs2d_tpu.eval.geometry import sample_mesh_points
    gt = sample_mesh_points(ov, of, 20000) * SCALE + OFFSET

    official = str(tmp_path / "official")
    _write_official(official, gt)

    masked_root = str(tmp_path / "dtu_masked")
    _write_fixture(masked_root, with_masks=True)
    out_masked = str(tmp_path / "out_masked")
    _write_model_out(out_masked, verts, faces)
    r_masked = _run_harness(masked_root, official, out_masked)

    unmasked_root = str(tmp_path / "dtu_unmasked")
    _write_fixture(unmasked_root, with_masks=False)
    out_unmasked = str(tmp_path / "out_unmasked")
    _write_model_out(out_unmasked, verts, faces)
    r_unmasked = _run_harness(unmasked_root, official, out_unmasked)

    cm = r_masked["per_scan"]["24"]["overall"]
    cu = r_unmasked["per_scan"]["24"]["overall"]
    # culling removes the floater → strictly better chamfer, near zero
    assert cm < cu * 0.8, (cm, cu)
    assert cm < 0.2, cm
    # the floater sits ~1.5+ world units off the object: without culling
    # the data→GT term must reflect it
    assert r_unmasked["per_scan"]["24"]["mean_d2s"] > \
        r_masked["per_scan"]["24"]["mean_d2s"] * 2


def test_cull_keeps_out_of_view_geometry(tmp_path):
    """Reference semantics: a vertex never seen by any camera passes the
    cull (sampled_mask + (1-valid) > 0)."""
    from gs2d_tpu.eval.dtu import cull_mesh_for_scan
    scan = _write_fixture(str(tmp_path / "d"), with_masks=True)
    # behind both cameras / far out of both frustums
    bv, bf = _cube([0, 0, 9.0], 0.1)
    out = cull_mesh_for_scan(bv, bf, scan)
    assert out is not None
    _, faces = out
    assert len(faces) == len(bf)

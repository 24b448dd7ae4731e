"""Trajectory/video utilities (reference utils/render_utils.py contract):
ellipse path generation from a ring of cameras, pose PCA normalization,
and the cv2 video export."""

import math
import os

import numpy as np
import pytest

from gs2d_tpu.scene.cameras import CameraData, make_camera
from gs2d_tpu.utils.render_paths import (create_video, focus_point_fn,
                                         generate_ellipse_path, generate_path,
                                         pad_poses, transform_poses_pca,
                                         unpad_poses, viewmatrix)


def _ring_cameras(n=12, radius=4.0, height=1.0):
    """Cameras on a circle looking at the origin (typical object capture)."""
    cams = []
    for i in range(n):
        th = 2 * math.pi * i / n
        pos = np.array([radius * math.cos(th), radius * math.sin(th), height])
        fwd = -pos / np.linalg.norm(pos)               # look at origin
        upw = np.array([0.0, 0.0, 1.0])
        right = np.cross(upw, fwd); right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rwc = np.stack([right, up, fwd], axis=1)       # world→? columns
        # COLMAP convention: R is cam→world rotation, T world→cam translation
        R = Rwc
        T = -Rwc.T @ pos
        cam = make_camera(R, T, math.radians(60), math.radians(45), 64, 48)
        cams.append(CameraData(camera=cam, R=R, T=T))
    return cams


def test_viewmatrix_orthonormal():
    m = viewmatrix(np.array([0.3, 0.4, 0.5]), np.array([0.0, 0.0, 1.0]),
                   np.array([1.0, 2.0, 3.0]))
    rot = m[:3, :3]
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:, 3], [1.0, 2.0, 3.0])


def test_transform_poses_pca_recenters():
    cams = _ring_cameras()
    c2ws = np.array([np.linalg.inv(np.asarray(cd.camera.world_view.T))
                     for cd in cams])
    poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    recentered, transform = transform_poses_pca(poses)
    # recentered positions are centered and scaled into [-1, 1]
    pos = recentered[:, :3, 3]
    assert np.abs(pos.mean(0)).max() < 0.5
    assert np.abs(pos).max() <= 1.0 + 1e-6
    # transform actually maps original → recentered
    back = unpad_poses(pad_poses(transform) @ pad_poses(poses))
    np.testing.assert_allclose(back[:, :3, 3], pos, atol=1e-6)


def test_focus_point_near_origin():
    cams = _ring_cameras()
    c2ws = np.array([np.linalg.inv(np.asarray(cd.camera.world_view.T))
                     for cd in cams])
    poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    fp = focus_point_fn(poses)
    assert np.linalg.norm(fp) < 0.5      # all cameras look at the origin


def test_generate_ellipse_path_shape():
    cams = _ring_cameras()
    c2ws = np.array([np.linalg.inv(np.asarray(cd.camera.world_view.T))
                     for cd in cams])
    poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    recentered, _ = transform_poses_pca(poses)
    path = generate_ellipse_path(recentered, n_frames=30)
    assert path.shape == (30, 3, 4)
    rots = path[:, :3, :3]
    eye = np.einsum("nij,nik->njk", rots, rots)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_generate_path_cameras():
    cams = _ring_cameras()
    path = generate_path(cams, n_frames=20)
    assert len(path) == 20
    ref = cams[0].camera
    for c in path:
        assert c.width == ref.width and c.height == ref.height
        assert abs(c.fovx - ref.fovx) < 1e-9
        # camera centers stay within the capture volume's ballpark
        assert np.linalg.norm(np.asarray(c.campos)) < 20.0


def test_create_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = [np.full((32, 48, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
    out = os.path.join(tmp_path, "t.mp4")
    create_video(frames, out, fps=10)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()

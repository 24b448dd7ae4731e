"""Camera trajectory utilities for free-view video export.

Capability of /root/reference/utils/render_utils.py (multinerf-derived):
focus-point estimation, PCA pose normalization, elliptical orbit paths,
Camera generation, and H.264 video export (cv2 instead of mediapy).
"""

from __future__ import annotations

import math
import os
from typing import List

import numpy as np


def normalize(x):
    return x / np.linalg.norm(x)


def focus_point_fn(poses: np.ndarray) -> np.ndarray:
    """Point minimizing squared distance to all camera z-axes
    (reference :68-74)."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    focus_pt = np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]
    return focus_pt


def transform_poses_pca(poses: np.ndarray):
    """Recenter and rotate poses so the principal axes align with the
    world axes (reference :76-107). Returns (poses_recentered, transform)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean
    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, inds]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_recentered = unpad_poses(
        pad_poses(transform) @ pad_poses(poses))
    if poses_recentered.mean(axis=0)[2, 1] < 0:
        poses_recentered = np.diag(np.array([1, -1, -1])) @ poses_recentered
        transform = np.diag(np.array([1, -1, -1, 1])) @ pad_poses(transform)
        transform = transform[:3]
    scale = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
    poses_recentered[:, :3, 3] *= scale
    transform = np.diag(np.array([scale] * 3 + [1])) @ pad_poses(transform)
    return poses_recentered, transform[:3]


def pad_poses(p):
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def generate_ellipse_path(poses: np.ndarray, n_frames: int = 120,
                          z_variation: float = 0.0,
                          z_phase: float = 0.0) -> np.ndarray:
    """Elliptical orbit through the camera centers at the focus height
    (reference :121-170)."""
    center = focus_point_fn(poses)
    offset = np.array([center[0], center[1], 0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    low = -sc + offset
    high = sc + offset
    z_low = np.percentile(poses[:, :3, 3], 10, axis=0)
    z_high = np.percentile(poses[:, :3, 3], 90, axis=0)

    def get_positions(theta):
        return np.stack([
            low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
            low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
            # reference: path height sits at z=0 (zero-mean capture
            # pattern after PCA recentering) — no focus-height offset
            z_variation * (z_low[2] + (z_high - z_low)[2]
                           * (np.cos(theta + 2 * np.pi * z_phase)
                              * 0.5 + 0.5)),
        ], -1)

    theta = np.linspace(0, 2.0 * np.pi, n_frames + 1, endpoint=True)
    positions = get_positions(theta)
    avg_up = poses[:, :3, 1].mean(0)
    avg_up = avg_up / np.linalg.norm(avg_up)
    ind_up = np.argmax(np.abs(avg_up))
    up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])

    return np.stack(
        [viewmatrix(p - center, up, p) for p in positions[:-1]])


def viewmatrix(lookdir, up, position):
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def generate_path(viewpoint_cameras, n_frames: int = 480) -> List:
    """Generate Camera objects along an ellipse path
    (reference :173-194)."""
    from ..scene.cameras import make_camera
    c2ws = np.array([np.linalg.inv(np.asarray(cd.camera.world_view.T))
                     for cd in viewpoint_cameras])
    pose = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
    pose_recenter, colmap_to_world_transform = transform_poses_pca(pose)
    new_poses = generate_ellipse_path(pose_recenter, n_frames=n_frames)
    new_poses = unpad_poses(
        np.linalg.inv(pad_poses(colmap_to_world_transform))
        @ pad_poses(new_poses))

    ref = viewpoint_cameras[0].camera
    # even dims like the reference (int(w/2)*2): odd-dimension frames
    # break 4:2:0 video encoders downstream
    vw, vh = (ref.width // 2) * 2, (ref.height // 2) * 2
    out = []
    for pose in new_poses:
        c2w = pad_poses(pose @ np.diag([1, -1, -1, 1]))
        w2c = np.linalg.inv(c2w)
        out.append(make_camera(
            w2c[:3, :3].T, w2c[:3, 3], ref.fovx, ref.fovy, vw, vh))
    return out


def create_video(frames: List[np.ndarray], path: str, fps: int = 30):
    """H.264-ish video via cv2 (replaces mediapy, reference :203-268)."""
    import cv2
    if not frames:
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not vw.isOpened():
        raise RuntimeError(
            f"cv2.VideoWriter could not open {path} (mp4v codec missing?)")
    for f in frames:
        img = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        vw.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    vw.release()

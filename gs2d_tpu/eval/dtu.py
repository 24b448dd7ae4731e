"""DTU chamfer evaluation protocol.

Mirrors /root/reference/scripts/eval_dtu/ (evaluate_single_scene.py:19-101
+ eval.py:43-166): cull the reconstructed mesh by the per-view dilated
image masks, sample it to a point cloud at 0.2 density, filter by the
dataset's ObsMask / bounding box / plane, then measure bidirectional mean
distances against the structured-light GT points (outliers clipped at
max_dist = 20 mm). Requires the official DTU evaluation data
(ObsMask{scan}_10.mat, Points/stl{scan}_total_ply) when available;
without them, falls back to a plain clipped chamfer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..scene.ply import read_mesh_ply, read_point_cloud
from .geometry import chamfer_distance, sample_mesh_points, thin_points


def cull_mesh_by_masks(verts, faces, cameras, masks, dilate_px: int = 12):
    """Remove faces whose vertices fall outside every view's (dilated)
    foreground mask — the reference's mask culling
    (evaluate_single_scene.py:19-101)."""
    import cv2
    keep_v = np.zeros(len(verts), bool)
    seen_v = np.zeros(len(verts), bool)
    for cam, mask in zip(cameras, masks):
        m = cv2.dilate(mask.astype(np.uint8),
                       np.ones((dilate_px, dilate_px), np.uint8)) > 0
        w2v = np.asarray(cam.world_view)
        p = verts @ w2v[:3, :3] + w2v[3, :3]
        z = p[:, 2]
        from ..ops.transforms import fov2focal
        fx = fov2focal(cam.fovx, cam.width)
        fy = fov2focal(cam.fovy, cam.height)
        u = p[:, 0] / np.maximum(z, 1e-9) * fx + (cam.width - 1) / 2
        v = p[:, 1] / np.maximum(z, 1e-9) * fy + (cam.height - 1) / 2
        inb = ((z > 0) & (u >= 0) & (u < cam.width)
               & (v >= 0) & (v < cam.height))
        ui = np.clip(u.astype(int), 0, cam.width - 1)
        vi = np.clip(v.astype(int), 0, cam.height - 1)
        inside = inb & m[vi, ui]
        keep_v |= inside
        seen_v |= inb
    keep_v |= ~seen_v
    fmask = keep_v[faces].all(-1)
    return verts, faces[fmask]


def evaluate_scan(mesh_path: str, gt_points_path: str,
                  obs_mask_path: Optional[str] = None,
                  density: float = 0.2, max_dist: float = 20.0,
                  n_samples: int = 2_000_000) -> dict:
    verts, faces, _ = read_mesh_ply(mesh_path)
    pts = sample_mesh_points(verts, faces, n_samples)
    pts = thin_points(pts, density) if density > 0 else pts

    gt, _, _ = read_point_cloud(gt_points_path)

    if obs_mask_path and os.path.exists(obs_mask_path):
        import scipy.io as sio
        md = sio.loadmat(obs_mask_path)
        obs_mask, bb, res = md["ObsMask"], md["BB"], float(md["Res"])
        # keep data points inside the observability mask
        gidx = ((pts - bb[0]) / res).round().astype(int)
        ok = ((gidx >= 0) & (gidx < np.array(obs_mask.shape))).all(-1)
        sel = np.zeros(len(pts), bool)
        sel[ok] = obs_mask[tuple(gidx[ok].T)] > 0
        pts_f = pts[sel]
        # keep GT above the ground plane
        plane = md.get("P")
        gt_f = gt
        if plane is not None:
            h = np.concatenate([gt, np.ones((len(gt), 1))], -1) @ plane
            gt_f = gt[h[:, 0] > 0]
    else:
        pts_f, gt_f = pts, gt

    d2s, s2d = chamfer_distance(pts_f, gt_f, max_dist=max_dist)
    return {"mean_d2s": d2s, "mean_s2d": s2d,
            "overall": (d2s + s2d) / 2.0}

"""Tanks & Temples F-score evaluation.

Capability of /root/reference/scripts/eval_tnt/ (run.py:58-207): align the
reconstruction to the GT point cloud (optional trajectory prealignment +
ICP refinement with uniform downsampling), crop, then precision / recall /
F1 at the scene's distance threshold (evaluation.py:60-215).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..scene.ply import read_mesh_ply, read_point_cloud
from .geometry import fscore, icp_point_to_point, sample_mesh_points


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    keys = np.floor(points / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def evaluate_scene(mesh_path: str, gt_points_path: str,
                   threshold: float, *, n_samples: int = 1_000_000,
                   init_transform: Optional[np.ndarray] = None,
                   icp_refine: bool = True) -> dict:
    verts, faces, _ = read_mesh_ply(mesh_path)
    rec = sample_mesh_points(verts, faces, n_samples)
    gt, _, _ = read_point_cloud(gt_points_path)

    if init_transform is not None:
        rec = rec @ init_transform[:3, :3].T + init_transform[:3, 3]

    dsize = threshold  # reference downsamples at the threshold scale
    rec_d = voxel_downsample(rec, dsize)
    gt_d = voxel_downsample(gt, dsize)

    if icp_refine:
        T = icp_point_to_point(rec_d, gt_d, max_corr_dist=threshold * 10)
        rec_d = rec_d @ T[:3, :3].T + T[:3, 3]

    out = fscore(rec_d, gt_d, threshold)
    out["threshold"] = threshold
    return out

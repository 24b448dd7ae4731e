#!/usr/bin/env python
"""Tanks & Temples harness: train → mesh → F1 per scene.

Mirrors /root/reference/scripts/tnt_eval.py: 6 scenes, `--depth_ratio 1
-r 2` with lambda_dist 100 (360 scenes) / 10 (large scenes), per-class
TSDF parameters, F1 against the official GT point clouds.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCENES_360 = ["Barn", "Caterpillar", "Ignatius", "Truck"]
SCENES_LARGE = ["Meetingroom", "Courthouse"]
# official distance thresholds (m)
def export_trajectory(src: str, out_log: str) -> None:
    """Write the scene's estimated camera trajectory (COLMAP poses,
    name-sorted, camera-to-world) in TnT .log format — the input the
    reference protocol registers against the GT SfM log."""
    import numpy as np

    from gs2d_tpu.eval.tnt import write_trajectory_log
    from gs2d_tpu.scene.colmap import (detect_model_dir, read_images_binary,
                                       read_images_text)
    model = detect_model_dir(os.path.join(src, "sparse"))
    bin_path = os.path.join(model, "images.bin")
    imgs = (read_images_binary(bin_path) if os.path.exists(bin_path)
            else read_images_text(os.path.join(model, "images.txt")))
    poses = []
    for img in sorted(imgs.values(), key=lambda im: im.name):
        from gs2d_tpu.scene.colmap import qvec2rotmat
        R = qvec2rotmat(img.qvec)
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ img.tvec
        poses.append(c2w)
    write_trajectory_log(out_log, np.stack(poses))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--TNT_data", required=True)
    ap.add_argument("--TNT_GT", default=None)
    ap.add_argument("--output_path", "-o", default="./eval/tnt")
    ap.add_argument("--scenes", nargs="+",
                    default=SCENES_360 + SCENES_LARGE)
    ap.add_argument("--skip_training", action="store_true")
    ap.add_argument("--skip_rendering", action="store_true")
    args = ap.parse_args()

    results = {}
    for scene in args.scenes:
        src = os.path.join(args.TNT_data, scene)
        out = os.path.join(args.output_path, scene)
        lam = "100" if scene in SCENES_360 else "10"
        if not args.skip_training:
            subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                            "-s", src, "-m", out, "-r", "2",
                            "--depth_ratio", "1.0", "--lambda_dist", lam],
                           check=True)
        if not args.skip_rendering:
            # reference per-class BOUNDED TSDF params (tnt_eval.py:40-46
            # — large scenes get a coarser/deeper volume, NOT the
            # unbounded contraction path)
            mesh_flags = (["--num_cluster", "1", "--voxel_size", "0.004",
                           "--sdf_trunc", "0.016", "--depth_trunc", "3.0"]
                          if scene in SCENES_360 else
                          ["--num_cluster", "1", "--voxel_size", "0.006",
                           "--sdf_trunc", "0.024", "--depth_trunc", "4.5"])
            subprocess.run([sys.executable, os.path.join(REPO, "render.py"),
                            "-m", out, "--skip_test"] + mesh_flags,
                           check=True)
        if args.TNT_GT:
            from gs2d_tpu.eval.tnt import run_tnt_evaluation
            from gs2d_tpu.scene.scene import search_max_iteration
            it = search_max_iteration(os.path.join(out, "point_cloud"))
            name = "fuse_post.ply" if scene in SCENES_360 \
                else "fuse_unbounded_post.ply"
            mesh = os.path.join(out, "train", f"ours_{it}", name)
            gt_dir = os.path.join(args.TNT_GT, scene)
            # estimated trajectory from the scene's COLMAP poses → .log
            traj = os.path.join(out, f"{scene}_traj.log")
            export_trajectory(src, traj)
            r = run_tnt_evaluation(mesh, gt_dir, traj,
                                   os.path.join(out, "tnt_eval"),
                                   scene=scene)
            r.pop("transform", None)
            r = {k: (v.tolist() if hasattr(v, "tolist") else v)
                 for k, v in r.items()}
            results[scene] = r
            print(f"{scene}: F1 {r['fscore']:.4f} "
                  f"(p {r['precision']:.4f} r {r['recall']:.4f})")
    if results:
        mean = sum(r["fscore"] for r in results.values()) / len(results)
        print("mean F1:", mean)
        with open(os.path.join(args.output_path, "results.json"), "w") as f:
            json.dump({"per_scene": results, "mean_f1": mean}, f, indent=2)

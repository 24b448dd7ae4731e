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
TAU = {"Barn": 0.01, "Caterpillar": 0.005, "Ignatius": 0.003,
       "Truck": 0.005, "Meetingroom": 0.01, "Courthouse": 0.025}

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
            mesh_flags = (["--num_cluster", "1", "--voxel_size", "0.004",
                           "--sdf_trunc", "0.016", "--depth_trunc", "3.0"]
                          if scene in SCENES_360 else
                          ["--num_cluster", "1", "--mesh_res", "1024",
                           "--unbounded"])
            subprocess.run([sys.executable, os.path.join(REPO, "render.py"),
                            "-m", out, "--skip_test"] + mesh_flags,
                           check=True)
        if args.TNT_GT:
            from gs2d_tpu.eval.tnt import evaluate_scene
            from gs2d_tpu.scene.scene import search_max_iteration
            it = search_max_iteration(os.path.join(out, "point_cloud"))
            name = "fuse_post.ply" if scene in SCENES_360 \
                else "fuse_unbounded_post.ply"
            mesh = os.path.join(out, "train", f"ours_{it}", name)
            gt = os.path.join(args.TNT_GT, scene, f"{scene}.ply")
            r = evaluate_scene(mesh, gt, TAU[scene])
            results[scene] = r
            print(f"{scene}: F1 {r['fscore']:.4f} "
                  f"(p {r['precision']:.4f} r {r['recall']:.4f})")
    if results:
        mean = sum(r["fscore"] for r in results.values()) / len(results)
        print("mean F1:", mean)
        with open(os.path.join(args.output_path, "results.json"), "w") as f:
            json.dump({"per_scene": results, "mean_f1": mean}, f, indent=2)

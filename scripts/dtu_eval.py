#!/usr/bin/env python
"""DTU benchmark harness: train → render/mesh → chamfer per scan.

Mirrors /root/reference/scripts/dtu_eval.py: 15 scans, train with
`-r 2 --depth_ratio 1 --lambda_dist 1000`, mesh with the fixed TSDF
parameters (voxel 0.004, sdf_trunc 0.016, depth_trunc 3.0, num_cluster 1),
then chamfer against the official DTU points (requires --DTU eval-data
dir with ObsMask/Points as in the official protocol).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtu", "-dtu", required=True,
                    help="preprocessed DTU dataset root (scan<id> dirs)")
    ap.add_argument("--DTU", required=False, default=None,
                    help="official eval data (ObsMask + Points)")
    ap.add_argument("--output_path", "-o", default="./eval/dtu")
    ap.add_argument("--scans", nargs="+", type=int, default=SCANS)
    ap.add_argument("--skip_training", action="store_true")
    ap.add_argument("--skip_rendering", action="store_true")
    args = ap.parse_args()

    results = {}
    for scan in args.scans:
        src = os.path.join(args.dtu, f"scan{scan}")
        out = os.path.join(args.output_path, f"scan{scan}")
        if not args.skip_training:
            subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                            "-s", src, "-m", out, "-r", "2",
                            "--depth_ratio", "1.0",
                            "--lambda_dist", "1000"], check=True)
        if not args.skip_rendering:
            subprocess.run([sys.executable, os.path.join(REPO, "render.py"),
                            "-m", out, "--skip_train", "--num_cluster", "1",
                            "--voxel_size", "0.004", "--sdf_trunc", "0.016",
                            "--depth_trunc", "3.0", "--skip_test"],
                           check=True)
        from gs2d_tpu.scene.scene import search_max_iteration
        it = search_max_iteration(os.path.join(out, "point_cloud"))
        mesh = os.path.join(out, "train", f"ours_{it}", "fuse_post.ply")
        if args.DTU:
            from gs2d_tpu.eval.dtu import evaluate_scan
            gt = os.path.join(args.DTU, "Points", "stl",
                              f"stl{scan:03d}_total.ply")
            obs = os.path.join(args.DTU, "ObsMask",
                               f"ObsMask{scan}_10.mat")
            # the protocol culls by the scan's dilated per-view masks
            # before sampling (reference evaluate_single_scene.py:19-101);
            # scan dirs lacking cameras.npz/mask fall back uncontrolled
            r = evaluate_scan(mesh, gt, obs, scan_dir=src)
            results[scan] = r
            print(f"scan{scan}: chamfer {r['overall']:.4f} "
                  f"(d2s {r['mean_d2s']:.4f} s2d {r['mean_s2d']:.4f})")
    if results:
        mean = sum(r["overall"] for r in results.values()) / len(results)
        print("mean chamfer:", mean)
        with open(os.path.join(args.output_path, "results.json"), "w") as f:
            json.dump({"per_scan": {str(k): v for k, v in results.items()},
                       "mean": mean}, f, indent=2)

#!/usr/bin/env python
"""MipNeRF-360 NVS harness: train → render → PSNR/SSIM/LPIPS per scene.

Mirrors /root/reference/scripts/m360_eval.py: outdoor scenes at images_4,
indoor at images_2, metrics via metrics.py.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
INDOOR = ["room", "counter", "kitchen", "bonsai"]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mipnerf360", "-m360", required=True)
    ap.add_argument("--output_path", "-o", default="./eval/m360")
    ap.add_argument("--scenes", nargs="+", default=OUTDOOR + INDOOR)
    ap.add_argument("--skip_training", action="store_true")
    ap.add_argument("--skip_rendering", action="store_true")
    ap.add_argument("--skip_metrics", action="store_true")
    args = ap.parse_args()

    out_paths = []
    for scene in args.scenes:
        src = os.path.join(args.mipnerf360, scene)
        out = os.path.join(args.output_path, scene)
        out_paths.append(out)
        images = "images_4" if scene in OUTDOOR else "images_2"
        if not args.skip_training:
            subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                            "-s", src, "-m", out, "-i", images, "--eval"],
                           check=True)
        if not args.skip_rendering:
            subprocess.run([sys.executable, os.path.join(REPO, "render.py"),
                            "-m", out, "--skip_train", "--skip_mesh"], check=True)
    if not args.skip_metrics:
        subprocess.run([sys.executable, os.path.join(REPO, "metrics.py"),
                        "-m"] + out_paths, check=True)

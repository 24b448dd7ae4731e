#!/usr/bin/env python
"""Scene-level parallel sweep: one training job per scene.

Capability of /root/reference/scripts/run_all.sh (naive data parallelism:
one scene per GPU via CUDA_VISIBLE_DEVICES); here scenes run sequentially
per TPU process or fan out across hosts with --shard i/n.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--output_root", default="./output/all")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--shard", default="0/1",
                    help="i/n — run every n-th scene starting at i")
    ap.add_argument("extra", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    i, n = (int(x) for x in args.shard.split("/"))
    failures = []
    for k, scene in enumerate(scenes):
        if k % n != i:
            continue
        print(f"=== {scene} ===")
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "-s", os.path.join(args.data_root, scene),
               "-m", os.path.join(args.output_root, scene)]
        cmd += [a for a in args.extra if a != "--"]
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"{scene} failed rc={rc}")
            failures.append(scene)
    if failures:
        print("failed scenes:", ", ".join(failures))
        sys.exit(1)

#!/usr/bin/env python
"""Batch render/mesh over a list of model directories.

Surface of /root/reference/render_all.py: `-md dir1 dir2 ...` runs the
render.py pipeline per model into a timestamped output tree.
"""

import argparse
import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dirs", "-md", nargs="+", required=True)
    ap.add_argument("--out_root", default=None)
    ap.add_argument("passthrough", nargs=argparse.REMAINDER,
                    help="flags forwarded to render.py")
    args = ap.parse_args()

    stamp = datetime.datetime.now().strftime("%y%m%d_%H%M")
    failures = []
    for md in args.model_dirs:
        print(f"=== rendering {md} ===")
        cmd = [sys.executable, os.path.join(REPO, "render.py"), "-m", md]
        cmd += [a for a in args.passthrough if a != "--"]
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            # do NOT copy: whatever train/test/traj dirs exist are stale
            # leftovers from a previous run — a results tree silently
            # mixing old renders is worse than a missing entry
            print(f"render failed for {md} (rc={rc}); skipping copy")
            failures.append(md)
            continue
        if args.out_root:
            dst = os.path.join(args.out_root, stamp,
                               os.path.basename(md.rstrip("/")))
            os.makedirs(dst, exist_ok=True)
            for sub in ("train", "test", "traj"):
                s = os.path.join(md, sub)
                if os.path.isdir(s):
                    subprocess.run(["cp", "-r", s, dst])
    if failures:
        print("failed models:", ", ".join(failures))
        sys.exit(1)

#!/usr/bin/env python
"""NVS metrics CLI: PSNR / SSIM / LPIPS over exported renders vs GT.

Surface of /root/reference/metrics.py:36-102: reads
`<model>/test/<method>/{renders,gt}`, writes results.json and
per_view.json. LPIPS is reported as null when pretrained VGG weights are
unavailable (zero-egress environment; see gs2d_tpu/eval/lpips.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image


def read_images(renders_dir, gt_dir):
    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)),
                       np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                       np.float32) / 255.0
        renders.append(r[..., :3].transpose(2, 0, 1))
        gts.append(g[..., :3].transpose(2, 0, 1))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, split="test"):
    import jax.numpy as jnp

    from gs2d_tpu.eval.lpips import LPIPS
    from gs2d_tpu.ops.ssim import psnr as psnr_fn
    from gs2d_tpu.ops.ssim import ssim as ssim_fn

    lpips = LPIPS()
    for model_path in model_paths:
        # per-scene isolation like the reference metrics.py: a broken
        # method dir (empty renders/, stray file) must not abort the
        # remaining scenes or lose already-computed results
        try:
            print("Scene:", model_path)
            full, per_view = {}, {}
            test_dir = os.path.join(model_path, split)
            if not os.path.isdir(test_dir):
                print("  no", split, "dir; skipping")
                continue
            for method in sorted(os.listdir(test_dir)):
                print("Method:", method)
                mdir = os.path.join(test_dir, method)
                renders, gts, names = read_images(
                    os.path.join(mdir, "renders"), os.path.join(mdir, "gt"))
                if not renders:
                    print("  no renders; skipping method")
                    continue
                ssims, psnrs, lpipss = [], [], []
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim_fn(rj, gj)))
                    psnrs.append(float(psnr_fn(rj, gj)))
                    lpipss.append(float(lpips(rj, gj))
                                  if lpips.available() else None)
                mean = lambda xs: (sum(xs) / len(xs)
                                   if xs and xs[0] is not None else None)
                print(f"  SSIM : {mean(ssims):.7f}")
                print(f"  PSNR : {mean(psnrs):.7f}")
                print(f"  LPIPS: {mean(lpipss)}")
                full[method] = {"SSIM": mean(ssims), "PSNR": mean(psnrs),
                                "LPIPS": mean(lpipss)}
                per_view[method] = {
                    "SSIM": dict(zip(names, ssims)),
                    "PSNR": dict(zip(names, psnrs)),
                    "LPIPS": dict(zip(names, lpipss)),
                }
            with open(os.path.join(model_path, "results.json"), "w") as f:
                json.dump(full, f, indent=2)
            with open(os.path.join(model_path, "per_view.json"), "w") as f:
                json.dump(per_view, f, indent=2)
        except Exception as e:              # noqa: BLE001 — reference parity
            print("Unable to compute metrics for", model_path, ":", e)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_paths", "-m", nargs="+", required=True)
    ap.add_argument("--split", default="test")
    args = ap.parse_args()
    evaluate(args.model_paths, args.split)

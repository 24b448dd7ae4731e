#!/usr/bin/env python
"""Convert torchvision VGG16 + lpips linear-head checkpoints into the npz
format gs2d_tpu/eval/lpips.py loads (GS2D_LPIPS_WEIGHTS).

Run in an environment with network access / local checkpoints:
    python scripts/convert_lpips_weights.py --out lpips_vgg.npz \
        [--vgg /path/vgg16.pth] [--lpips /path/lpips_vgg.pth]
Defaults pull torchvision's VGG16 features and the official LPIPS v0.1
vgg.pth (the same weights the reference's lpipsPyTorch fetches).
"""

import argparse

import numpy as np

# torchvision vgg16.features module indices of the 13 convs
CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_state_dicts(vgg_sd, lpips_sd):
    """torchvision vgg16.features state dict + LPIPS v0.1 lin-head state
    dict → the flat npz layout gs2d_tpu/eval/lpips.py loads."""
    def to_np(t):
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)

    out = {}
    for i, ci in enumerate(CONV_IDX):
        out[f"conv{i}_w"] = to_np(vgg_sd[f"{ci}.weight"])
        out[f"conv{i}_b"] = to_np(vgg_sd[f"{ci}.bias"])
    for j in range(5):
        w = to_np(lpips_sd[f"lin{j}.model.1.weight"])  # (1, C, 1, 1)
        out[f"lin{j}"] = w.reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--vgg", default=None)
    ap.add_argument("--lpips", default=None)
    args = ap.parse_args()

    import torch

    if args.vgg:
        sd = torch.load(args.vgg, map_location="cpu")
    else:
        from torchvision.models import vgg16
        sd = vgg16(weights="IMAGENET1K_V1").features.state_dict()

    if args.lpips:
        lsd = torch.load(args.lpips, map_location="cpu")
    else:
        import urllib.request
        url = ("https://raw.githubusercontent.com/richzhang/"
               "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")
        fn, _ = urllib.request.urlretrieve(url)
        lsd = torch.load(fn, map_location="cpu")

    out = convert_state_dicts(sd, lsd)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()

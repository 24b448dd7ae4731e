"""LPIPS parity: jnp implementation vs a torch oracle of the reference's
vendored lpipsPyTorch formula (VERDICT r1 item 8).

The oracle replicates /root/reference/lpipsPyTorch/modules exactly:
z-score of the [0,1] image (NO richzhang [-1,1] remap — the vendored code
omits it), VGG16 taps after relu1_2/2_2/3_3/4_3/5_3, per-channel unit
normalization x/(||x||+1e-10), squared diff, non-negative 1x1 lin heads,
spatial mean, sum over layers. Weights are small random tensors in the
torchvision/lpips state-dict layouts, converted through the real
scripts/convert_lpips_weights.py mapping — so the test also pins the
converter round-trip.
"""

import sys
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convert_lpips_weights import CONV_IDX, convert_state_dicts  # noqa: E402

from gs2d_tpu.eval.lpips import _TAPS, _VGG_PLAN, LPIPS  # noqa: E402

# reduced channel plan (full VGG /8) — same topology, fast on CPU
_CH = [c // 8 for c, _ in _VGG_PLAN]


def _random_state_dicts(seed=0):
    g = torch.Generator().manual_seed(seed)
    vgg_sd = {}
    in_c = 3
    for i, ci in enumerate(CONV_IDX):
        out_c = _CH[i]
        vgg_sd[f"{ci}.weight"] = torch.randn(
            (out_c, in_c, 3, 3), generator=g) * 0.2
        vgg_sd[f"{ci}.bias"] = torch.randn((out_c,), generator=g) * 0.1
        in_c = out_c
    lpips_sd = {}
    for j, t in enumerate(_TAPS):
        c = _CH[t]
        lpips_sd[f"lin{j}.model.1.weight"] = torch.rand(
            (1, c, 1, 1), generator=g)
    return vgg_sd, lpips_sd


def _torch_lpips(vgg_sd, lpips_sd, x, y):
    """The vendored reference formula, verbatim semantics."""
    import torch.nn.functional as F

    mean = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    std = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(img):
        h = (img[None] - mean) / std
        taps = []
        for i, (_, pool) in enumerate(_VGG_PLAN):
            if pool:
                h = F.max_pool2d(h, 2, 2)
            h = F.conv2d(h, vgg_sd[f"{CONV_IDX[i]}.weight"],
                         vgg_sd[f"{CONV_IDX[i]}.bias"], padding=1)
            h = F.relu(h)
            if i in _TAPS:
                n = torch.sqrt(torch.sum(h ** 2, dim=1, keepdim=True))
                taps.append(h / (n + 1e-10))
        return taps

    fx, fy = feats(x), feats(y)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        w = lpips_sd[f"lin{j}.model.1.weight"]
        total = total + F.conv2d(d, w).mean((2, 3))
    return float(total)


def test_lpips_matches_torch_oracle(tmp_path):
    vgg_sd, lpips_sd = _random_state_dicts()
    npz = convert_state_dicts(vgg_sd, lpips_sd)
    path = tmp_path / "lpips_small.npz"
    np.savez(path, **npz)

    model = LPIPS(str(path))
    assert model.available()

    rng = np.random.default_rng(7)
    x = rng.random((3, 64, 96), dtype=np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal((3, 64, 96)).astype(
        np.float32), 0, 1)

    ours = float(model(x, y))
    ref = _torch_lpips(vgg_sd, lpips_sd,
                       torch.from_numpy(x), torch.from_numpy(y))
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)
    # identical images → zero distance
    assert float(model(x, x)) == pytest.approx(0.0, abs=1e-8)


def test_lpips_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv("GS2D_LPIPS_WEIGHTS", raising=False)
    model = LPIPS()
    assert not model.available()
    with pytest.raises(AssertionError):
        model(np.zeros((3, 8, 8), np.float32),
              np.zeros((3, 8, 8), np.float32))

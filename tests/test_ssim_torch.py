"""SSIM parity against a torch implementation of the reference's
gaussian-window SSIM (loss_utils.py:37-73)."""

import numpy as np


def _torch_ssim(a, b, window_size=11, sigma=1.5):
    import torch
    import torch.nn.functional as F

    xs = torch.arange(window_size, dtype=torch.float32)
    g = torch.exp(-(xs - window_size // 2) ** 2 / (2 * sigma ** 2))
    g = (g / g.sum())
    w2d = (g[:, None] @ g[None, :]).float()
    C = a.shape[0]
    win = w2d.expand(C, 1, window_size, window_size).contiguous()
    x = torch.tensor(a)[None]
    y = torch.tensor(b)[None]
    pad = window_size // 2
    mu1 = F.conv2d(x, win, padding=pad, groups=C)
    mu2 = F.conv2d(y, win, padding=pad, groups=C)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(x * x, win, padding=pad, groups=C) - mu1_sq
    s2 = F.conv2d(y * y, win, padding=pad, groups=C) - mu2_sq
    s12 = F.conv2d(x * y, win, padding=pad, groups=C) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_matches_torch_reference():
    import jax.numpy as jnp

    from gs2d_tpu.ops.ssim import ssim
    rng = np.random.default_rng(0)
    a = rng.random((3, 40, 56)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1) \
        .astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)
    assert abs(ours - ref) < 1e-5, (ours, ref)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6

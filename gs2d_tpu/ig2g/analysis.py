"""Frequency-domain and similarity analysis utilities.

Capability of the reference's standalone research scripts under
/root/reference/diffusion/ (frequency_plot.py, frequency_similarity.py,
latents_frequency_*.py, image_similarity.py): radially-averaged FFT power
spectra, band-wise spectrum similarity between images/latents, pixel/
frequency similarity matrices, and a small DDPM ancestral sampler over the
shared schedule. Pure numpy/jnp; plotting helpers use matplotlib.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops import DDIMSchedule


def power_spectrum_2d(x: np.ndarray) -> np.ndarray:
    """(C, H, W) or grayscale (H, W) → centered log-power spectrum,
    channel-averaged (the reference scripts feed IMREAD_GRAYSCALE 2-D
    arrays)."""
    x = np.asarray(x, np.float64)
    if x.ndim == 2:
        x = x[None]
    f = np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
    return np.log1p(np.abs(f) ** 2).mean(0)


def radial_spectrum(x: np.ndarray, n_bins: int = 64) -> np.ndarray:
    """Radially-averaged power spectrum profile (n_bins,)."""
    ps = power_spectrum_2d(x)
    H, W = ps.shape
    yy, xx = np.mgrid[:H, :W]
    r = np.hypot(yy - H / 2, xx - W / 2)
    r_norm = r / r.max()
    bins = np.clip((r_norm * n_bins).astype(int), 0, n_bins - 1)
    out = np.zeros(n_bins)
    cnt = np.bincount(bins.ravel(), minlength=n_bins)
    np.add.at(out, bins.ravel(), ps.ravel())
    return out / np.maximum(cnt, 1)


def spectrum_similarity(a: np.ndarray, b: np.ndarray,
                        n_bins: int = 64) -> float:
    """Cosine similarity of radial spectra (frequency_similarity.py)."""
    ra = radial_spectrum(a, n_bins)
    rb = radial_spectrum(b, n_bins)
    return float(np.dot(ra, rb)
                 / (np.linalg.norm(ra) * np.linalg.norm(rb) + 1e-12))


def image_similarity_matrix(images: Sequence[np.ndarray],
                            metric: str = "l2") -> np.ndarray:
    """Pairwise similarity grid (image_similarity.py)."""
    if metric not in ("l2", "cosine", "spectrum"):
        raise ValueError(f"unknown metric {metric!r}")
    n = len(images)
    out = np.zeros((n, n))
    if metric == "spectrum":
        # precompute one radial spectrum per image (the naive pairwise
        # form re-runs the FFT 2n^2 times) and exploit symmetry
        specs = [radial_spectrum(im) for im in images]
        norms = [np.linalg.norm(sp) for sp in specs]
        for i in range(n):
            for j in range(i, n):
                v = float(np.dot(specs[i], specs[j])
                          / (norms[i] * norms[j] + 1e-12))
                out[i, j] = out[j, i] = v
        return out
    for i in range(n):
        for j in range(i, n):
            a, b = images[i], images[j]
            if metric == "l2":
                v = -np.sqrt(np.mean((a - b) ** 2))
            else:
                v = (a.ravel() @ b.ravel()
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
            out[i, j] = out[j, i] = v
    return out


def ddpm_sample(predict_eps, shape, key, num_steps: int = 50,
                schedule: DDIMSchedule | None = None) -> jnp.ndarray:
    """Ancestral DDPM sampling loop (diffusion/main.py capability) with a
    pluggable ε-predictor."""
    # never mutate a caller-supplied schedule: set_timesteps would
    # clobber its timesteps/step_ratio for later use
    import copy
    sched = copy.copy(schedule) if schedule is not None else DDIMSchedule()
    sched.set_timesteps(num_steps)
    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, shape)
    for t in sched.timesteps:
        t = int(t)
        a_t = sched.alphas_cumprod[t]
        t_prev = max(t - sched.step_ratio, 0)
        a_prev = sched.alphas_cumprod[t_prev] if t - sched.step_ratio >= 0 \
            else 1.0
        eps = predict_eps(x, t)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        alpha_step = a_t / a_prev
        sigma = jnp.sqrt((1 - a_prev) / (1 - a_t)
                         * (1 - alpha_step)) if t - sched.step_ratio >= 0 \
            else 0.0
        mean = jnp.sqrt(a_prev) * x0 \
            + jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, shape)
        x = mean + sigma * noise
    return x


def plot_spectra(images: List[np.ndarray], labels: List[str], path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    for img, lab in zip(images, labels):
        ax.plot(radial_spectrum(img), label=lab)
    ax.set_xlabel("radial frequency bin")
    ax.set_ylabel("log power")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)

"""Pure diffusion-editing math (jnp).

Numeric contracts from /root/reference/ig2g/ip2p.py and the vendored
modified diffusers UNet (lib/diffusers-0.30.2/.../unet_2d_condition.py):

 * fft_band             — ip2p.py:60-82 (get_low_or_high_fft)
 * normalize_latent_noise — ip2p.py:85-109
 * DDIMSchedule         — the DDIM add-noise/step math used by the fork
   (eta=0, "leading" timestep spacing, SD scaled-linear betas), including
   the fork's trick of shrinking num_train_timesteps to the sampled T so
   the 20-step grid spans [0, T] (ip2p.py:228-231)
 * cfg_combine / cfg_combine_rendered — the 3-way classifier-free
   guidance combinations (ip2p.py:356-394)
 * fuse_skip_residuals  — the λ-blend of skip residuals from two UNet
   passes (unet_2d_condition.py:1795: res₁·(1−λ) + res₂·λ)
 * noise_calibration    — the FFT Noise Calibration loop (Algorithm 1,
   ip2p.py:283-311) with a pluggable ε-predictor
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


def fft_band(x: jnp.ndarray, scale: float, is_low: bool = True):
    """Keep only the low (or high) centered frequency square of half-size
    ``scale`` per spatial dim. x: (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    f = jnp.fft.fftshift(jnp.fft.fftn(x, axes=(-2, -1)), axes=(-2, -1))
    crow, ccol = H // 2, W // 2
    dr, dc = int(crow * scale), int(ccol * scale)
    mask = np.zeros((H, W), np.float32)
    mask[crow - dr:crow + dr, ccol - dc:ccol + dc] = 1.0
    if not is_low:
        mask = 1.0 - mask
    f = f * mask
    out = jnp.fft.ifftn(jnp.fft.ifftshift(f, axes=(-2, -1)),
                        axes=(-2, -1))
    return jnp.real(out)


def normalize_latent_noise(noise: jnp.ndarray,
                           use_outlier_clipping: bool = False,
                           use_scaling: bool = False) -> jnp.ndarray:
    """Per-channel standardization with optional ±3 clip and [-1,1]
    rescale. noise: (B, C, H, W)."""
    mean = noise.mean(axis=(2, 3), keepdims=True)
    std = noise.std(axis=(2, 3), keepdims=True, ddof=1)
    out = (noise - mean) / std
    if use_outlier_clipping:
        out = jnp.clip(out, -3.0, 3.0)
    if use_scaling:
        lo = out.min(axis=(2, 3), keepdims=True)
        hi = out.max(axis=(2, 3), keepdims=True)
        out = 2.0 * (out - lo) / (hi - lo) - 1.0
    return out


@dataclasses.dataclass
class DDIMSchedule:
    """DDIM (eta=0) with SD scaled-linear betas and leading spacing."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    steps_offset: int = 1

    def __post_init__(self):
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps) ** 2
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - betas), jnp.float32)

    def set_timesteps(self, num_inference_steps: int,
                      effective_train_timesteps: int | None = None):
        """'leading' spacing over [0, effective_train_timesteps); the fork
        shrinks the effective range to its randomly-sampled T."""
        n_train = effective_train_timesteps or self.num_train_timesteps
        step_ratio = max(n_train // num_inference_steps, 1)
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.astype(np.int64) + self.steps_offset
        ts = np.clip(ts, 0, self.num_train_timesteps - 1)
        self.timesteps = ts
        self.step_ratio = step_ratio
        return ts

    def add_noise(self, x0, noise, t):
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def step(self, noise_pred, t, latents):
        """One reverse DDIM step from t to t - step_ratio.

        t_prev < 0 uses final_alpha_cumprod = alphas_cumprod[0] — the
        fork's scheduler config has set_alpha_to_one=false
        (scheduling_ddim.py:227), so the LAST step of every edit keeps a
        ~sqrt(1-a0)·eps term rather than returning x0 exactly."""
        a_t = self.alphas_cumprod[t]
        t_prev = t - self.step_ratio
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[
            jnp.maximum(t_prev, 0)], self.alphas_cumprod[0])
        x0_pred = (latents - jnp.sqrt(1.0 - a_t) * noise_pred) \
            / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0_pred \
            + jnp.sqrt(1.0 - a_prev) * noise_pred


def cfg_combine(pred_text, pred_image, pred_uncond,
                guidance_scale: float, image_guidance_scale: float):
    """Standard IP2P 3-way guidance (ip2p.py:388-393)."""
    return (pred_uncond
            + guidance_scale * (pred_text - pred_image)
            + image_guidance_scale * (pred_image - pred_uncond))


def cfg_combine_rendered(pred_text, pred_image, pred_uncond,
                         rendered_text, rendered_image, rendered_uncond,
                         guidance_scale: float,
                         image_guidance_scale: float,
                         noise_guidance_scale: float,
                         noise_guidance_scale2: float,
                         mode: str = "cfg"):
    """The fork's experimental rendered-noise CFG variants
    (ip2p.py:356-386)."""
    if mode == "cfg":
        return (pred_uncond
                + guidance_scale * (pred_text - pred_image)
                + image_guidance_scale * (pred_image - pred_uncond)
                + noise_guidance_scale * (rendered_image - pred_uncond)
                + noise_guidance_scale2 * (rendered_image - pred_image))
    if mode == "cfg-simple":
        return (rendered_uncond
                + guidance_scale * (pred_text - pred_image)
                + image_guidance_scale * (pred_image - pred_uncond))
    raise ValueError(mode)


def fuse_skip_residuals(res_a, res_b, lam: float):
    """res_a·(1−λ) + res_b·λ — the vendored UNet forward_fused blend."""
    return res_a * (1.0 - lam) + res_b * lam


def noise_calibration(latents_0: jnp.ndarray, x_r: jnp.ndarray,
                      e_t: jnp.ndarray, schedule: DDIMSchedule,
                      t0: int, predict_eps: Callable,
                      scale: float, is_low: bool, steps: int):
    """FFT Noise Calibration (Algorithm 1 of the Noise Calibration paper,
    as implemented at ip2p.py:283-311): iteratively replace the chosen
    frequency band of the implied x0 with the reference's band, mapping
    the correction back into the initial noise."""
    a_t = schedule.alphas_cumprod[t0 - 1]
    sqrt_a = jnp.sqrt(a_t)
    sqrt_1ma = jnp.sqrt(1.0 - a_t)
    for _ in range(steps):
        # the reference's ACTIVE line feeds the clean latents to the
        # UNet each iteration (ip2p.py:289: cat([latents_0]*3); the
        # noised apply_model form is commented out there) — so e_theta
        # is fixed across iterations and x0_t is derived from the
        # noised sample built from the CURRENT e_t
        x = schedule.add_noise(latents_0, e_t, t0)
        e_theta = predict_eps(latents_0, t0)
        x0_t = (x - sqrt_1ma * e_theta) / sqrt_a
        e_t = e_theta + sqrt_a / sqrt_1ma * (
            fft_band(x0_t, scale, is_low) - fft_band(x_r, scale, is_low))
    return schedule.add_noise(latents_0, e_t, t0), e_t

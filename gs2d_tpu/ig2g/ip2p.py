"""InstructPix2Pix editor with pluggable backends.

Mirrors the reference wrapper's edit flow (/root/reference/ig2g/ip2p.py:
196-401): sample an editing strength T in [lower, upper]·1000, build a
20-step DDIM grid over [0, T], initialize the diffusion noise per
``noise_type`` — 'None' (gaussian), 'encoded' / 'encoded-normalized'
(VAE-encoded rendered noise, optionally standardized per ``noise_reg``),
'concat' (rendered-noise latents replace the image-conditioning row) —
optionally run FFT noise calibration, then denoise with 3-way
classifier-free guidance (text / image / uncond), including the fork's
"intermediate" (fused-skip) and "cfg" rendered-noise modes.

Backends:
 * "jax" — the real editor: SD-1.5/IP2P UNet + VAE implemented in jnp
   (sdnet.py/vae.py), weight-gated on a local diffusers snapshot
   ($GS2D_SD_WEIGHTS; the zero-egress image ships no checkpoints). Runs
   the fork's intermediate/fused-skip UNet modes and FreeU natively.
 * "stub" — a deterministic latent-identity backend (pixel-space
   "latents", an ε-predictor that nudges toward the conditioning image)
   so the entire editing control flow is exercisable in tests and
   plumbing runs without SD weights.
 * any object implementing the backend protocol (tests pass a
   JaxSDBackend built with tiny random weights).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .ops import (DDIMSchedule, cfg_combine, cfg_combine_rendered,
                  fft_band, noise_calibration, normalize_latent_noise)

CONST_SCALE = 0.18215
IMG_DIM = 512


@dataclasses.dataclass
class IP2PParams:
    """Fork knobs (arguments/__init__.py:96-131 subset)."""
    guidance_scale: float = 12.5
    image_guidance_scale: float = 1.5
    diffusion_steps: int = 20
    lower_bound: float = 0.70
    upper_bound: float = 0.98
    noise_type: str = "None"
    noise_reg: str = "outlier"
    freeu_mode: str = "None"      # None|intermediate|intermediate-reverse|cfg|cfg-simple
    lambda_intermediate: float = 1.0
    # FreeU backbone/skip scaling (reference ip2p.py:165-168)
    is_freeu: bool = False
    freeu_s1: float = 0.9
    freeu_s2: float = 0.2
    freeu_b1: float = 1.2
    freeu_b2: float = 1.4
    noise_guidance_scale: float = 0.0
    noise_guidance_scale2: float = 0.0
    is_noise_calibration: bool = False
    noise_calibration_steps: int = 3
    noise_calibration_scale: float = 1.0
    noise_calibration_scale_is_low: bool = False


class StubBackend:
    """Latent space == pixel space; ε-predictor pulls toward image_cond."""

    def encode(self, img):
        return img * 2.0 - 1.0

    def encode_mode(self, img):
        return img * 2.0 - 1.0

    def decode(self, lat):
        return jnp.clip((lat + 1.0) / 2.0, 0.0, 1.0)

    def make_eps_predictor(self, schedule, image_cond_latents,
                           text_embeddings):
        cond = image_cond_latents[0]

        def predict(latents, t):
            a = schedule.alphas_cumprod[t]
            # exact ε for x0 = cond: ε = (x_t − sqrt(a)·x0)/sqrt(1−a)
            eps = (latents - jnp.sqrt(a) * cond) / jnp.sqrt(1.0 - a)
            return eps, eps, eps     # text / image / uncond
        return predict

    def make_fused_predictor(self, schedule, image_cond_latents,
                             text_embeddings, lam):
        """Fused-skip analog for the stub: λ-blend the two ε estimates."""
        predict = self.make_eps_predictor(schedule, image_cond_latents,
                                          text_embeddings)

        def predict_fused(latents_backbone, latents_skips, t):
            e1 = predict(latents_backbone, t)
            e2 = predict(latents_skips, t)
            return tuple(a * (1.0 - lam) + b * lam
                         for a, b in zip(e1, e2))
        return predict_fused


class JaxSDBackend:
    """The real editor: SD-1.5/InstructPix2Pix UNet + VAE in jnp
    (sdnet.py / vae.py), weight-gated on a local diffusers snapshot
    (sd_weights.py; zero-egress image ships no checkpoints).

    ``unet_params``/``vae_params`` may be passed directly (tests use tiny
    random configs); otherwise they are loaded from ``weights_root`` /
    $GS2D_SD_WEIGHTS. Matches the reference wrapper's VAE conventions
    (/root/reference/ig2g/ip2p.py:403-504): posterior-sample for the
    edited image, mode for conditioning (unscaled), 0.18215 latent scale
    handled by the caller/decode split exactly like the torch code.
    """

    def __init__(self, weights_root: Optional[str] = None,
                 unet_cfg=None, vae_cfg=None,
                 unet_params: Optional[dict] = None,
                 vae_params: Optional[dict] = None,
                 freeu: Optional[object] = None, seed: int = 0):
        from .sdnet import SD15_IP2P_UNET
        from .vae import SD15_VAE
        self.unet_cfg = unet_cfg or SD15_IP2P_UNET
        self.vae_cfg = vae_cfg or SD15_VAE
        if unet_params is None or vae_params is None:
            from . import sd_weights
            root = sd_weights.weights_root(weights_root)
            if root is None:
                raise FileNotFoundError(
                    "no SD weights: set $GS2D_SD_WEIGHTS to a diffusers "
                    "snapshot of timbrooks/instruct-pix2pix, or pass "
                    "unet_params/vae_params explicitly")
            unet_params = unet_params or sd_weights.load_unet(
                root, self.unet_cfg)
            vae_params = vae_params or sd_weights.load_vae(
                root, self.vae_cfg)
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.freeu = freeu
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)
        # params are passed as ARGUMENTS, never closed over: jit folds
        # closure arrays into the lowered module as constants — 3.4 GB of
        # UNet weights baked into the HLO bloats trace/compile and makes
        # the module hash weight-dependent, defeating the persistent
        # compile cache (memory: constants force cold compiles)
        self._jit_unet = jax.jit(self._unet_raw)
        self._jit_unet_fused = jax.jit(self._unet_fused_raw,
                                       static_argnames=("lam",))
        self._jit_decode = jax.jit(self._decode_raw)
        self._jit_encode_moments = jax.jit(self._encode_moments_raw)

    # -- VAE boundary ----------------------------------------------------
    def _encode_moments_raw(self, vae_params, img):
        from .vae import vae_encode_moments
        return vae_encode_moments(self.vae_cfg, vae_params,
                                  img * 2.0 - 1.0)

    def encode(self, img):
        """Posterior sample (reference imgs_to_latent), unscaled."""
        from .vae import vae_sample
        mean, logvar = self._jit_encode_moments(self.vae_params, img)
        self._key, sub = jax.random.split(self._key)
        return vae_sample(mean, logvar, sub)

    def encode_mode(self, img):
        """Posterior mode (reference prepare_image_latents), unscaled."""
        return self._jit_encode_moments(self.vae_params, img)[0]

    def _decode_raw(self, vae_params, lat):
        from .vae import SD_LATENT_SCALE, vae_decode
        img = vae_decode(self.vae_cfg, vae_params,
                         lat / SD_LATENT_SCALE)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    def decode(self, lat):
        return self._jit_decode(self.vae_params, lat)

    # -- UNet boundary ---------------------------------------------------
    def _unet_raw(self, unet_params, latents3, cond3, ctx3, t):
        from .sdnet import unet_apply
        x = jnp.concatenate([latents3, cond3], axis=1)   # (3, 8, h, w)
        return unet_apply(self.unet_cfg, unet_params, x, t, ctx3,
                          freeu=self.freeu)

    def _unet_fused_raw(self, unet_params, latents3, skips_src3, cond3,
                        ctx3, t, lam):
        from .sdnet import unet_apply_fused, unet_apply_intermediate
        x_skips = jnp.concatenate([skips_src3, cond3], axis=1)
        skips2 = unet_apply_intermediate(self.unet_cfg, unet_params,
                                         x_skips, t, ctx3)
        x = jnp.concatenate([latents3, cond3], axis=1)
        return unet_apply_fused(self.unet_cfg, unet_params, x, skips2,
                                lam, t, ctx3, freeu=self.freeu)

    def make_eps_predictor(self, schedule, image_cond_latents,
                           text_embeddings):
        cond3 = image_cond_latents

        def predict(latents, t):
            lat3 = jnp.concatenate([latents] * 3, axis=0)
            eps = self._jit_unet(self.unet_params, lat3, cond3,
                                 text_embeddings, jnp.int32(t))
            return eps[0:1], eps[1:2], eps[2:3]
        return predict

    def make_fused_predictor(self, schedule, image_cond_latents,
                             text_embeddings, lam):
        """The fork's forward_intermediate + forward_fused pair
        (unet_2d_condition.py:1552,1795): skips from one pass, backbone
        from the other, blended res1*(1-λ)+res2*λ."""
        cond3 = image_cond_latents

        def predict_fused(latents_backbone, latents_skips, t):
            b3 = jnp.concatenate([latents_backbone] * 3, axis=0)
            s3 = jnp.concatenate([latents_skips] * 3, axis=0)
            eps = self._jit_unet_fused(self.unet_params, b3, s3, cond3,
                                       text_embeddings, jnp.int32(t),
                                       float(lam))
            return eps[0:1], eps[1:2], eps[2:3]
        return predict_fused


class InstructPix2Pix:
    def __init__(self, params: IP2PParams, backend="stub", seed: int = 0):
        self.p = params
        self.schedule = DDIMSchedule()
        if backend == "stub":
            self.backend = StubBackend()
        elif backend == "jax":
            freeu = None
            if params.is_freeu:
                from .sdnet import FreeUParams
                freeu = FreeUParams(s1=params.freeu_s1, s2=params.freeu_s2,
                                    b1=params.freeu_b1, b2=params.freeu_b2)
            self.backend = JaxSDBackend(freeu=freeu, seed=seed)
        elif isinstance(backend, str):
            raise ValueError(
                f"unknown editor backend {backend!r}: expected 'stub', "
                "'jax', or a pre-built backend object")
        else:
            self.backend = backend    # pre-built backend object (tests)
        self.key = jax.random.PRNGKey(seed)
        self.num_train_timesteps = 1000

    def _split_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def edit_image(self, text_embeddings, image: jnp.ndarray,
                   image_cond: jnp.ndarray,
                   rendered_noise: Optional[jnp.ndarray] = None
                   ) -> jnp.ndarray:
        """image / image_cond / rendered_noise: (1, 3, H, W) in [0, 1]."""
        p = self.p
        be = self.backend
        min_step = int(self.num_train_timesteps * p.lower_bound)
        max_step = int(self.num_train_timesteps * p.upper_bound)
        T = int(jax.random.randint(self._split_key(), (), min_step,
                                   max_step + 1))
        self.schedule.set_timesteps(p.diffusion_steps,
                                    effective_train_timesteps=T)
        t0 = int(self.schedule.timesteps[0])

        latents_0 = be.encode(image) * CONST_SCALE \
            if not isinstance(be, StubBackend) else be.encode(image)
        cond_lat = be.encode_mode(image_cond)
        uncond = jnp.zeros_like(cond_lat)
        image_cond_latents = jnp.concatenate(
            [cond_lat, cond_lat, uncond], axis=0)

        latents_rendered = None
        if p.noise_type == "None" or "concat" in p.noise_type:
            noise = jax.random.normal(self._split_key(), latents_0.shape)
            if "concat" in p.noise_type and rendered_noise is not None:
                noise_lat = be.encode_mode(rendered_noise)
                image_cond_latents = image_cond_latents.at[1].set(
                    noise_lat[0])
        else:
            noise = rendered_noise
            if "encoded" in p.noise_type:
                noise_r = be.encode_mode(rendered_noise)
                if "encoded-normalized" in p.noise_type:
                    noise_r = normalize_latent_noise(
                        noise_r,
                        use_outlier_clipping="outlier" in p.noise_reg,
                        use_scaling="scaling" in p.noise_reg)
                if p.freeu_mode in ("intermediate", "intermediate-reverse",
                                    "cfg", "cfg-simple"):
                    noise = jax.random.normal(self._split_key(),
                                              latents_0.shape)
                    latents_rendered = self.schedule.add_noise(
                        latents_0, noise_r, t0)
                else:
                    noise = noise_r

        latents = self.schedule.add_noise(latents_0, noise, t0)

        predict = be.make_eps_predictor(self.schedule, image_cond_latents,
                                        text_embeddings)

        if p.is_noise_calibration:
            def eps_image(x, t):
                return predict(x, t)[1]
            latents, _ = noise_calibration(
                latents_0, cond_lat[0:1], noise, self.schedule, t0,
                eps_image, p.noise_calibration_scale,
                p.noise_calibration_scale_is_low,
                p.noise_calibration_steps)

        fused = None
        if p.freeu_mode in ("intermediate", "intermediate-reverse") \
                and latents_rendered is not None:
            fused = self.backend.make_fused_predictor(
                self.schedule, image_cond_latents, text_embeddings,
                p.lambda_intermediate)

        for t in self.schedule.timesteps:
            t = int(t)
            if fused is not None:
                # "intermediate": backbone = gaussian-noised latents,
                # skips = rendered-noise latents; "-reverse" swaps them
                # (reference ip2p.py:321-343; latents_rendered stays fixed
                # through the loop, as in the fork).
                if p.freeu_mode == "intermediate":
                    e_text, e_image, e_uncond = fused(
                        latents, latents_rendered, t)
                else:
                    e_text, e_image, e_uncond = fused(
                        latents_rendered, latents, t)
                eps = cfg_combine(e_text, e_image, e_uncond,
                                  p.guidance_scale, p.image_guidance_scale)
                latents = self.schedule.step(eps, t, latents)
                continue
            e_text, e_image, e_uncond = predict(latents, t)
            if p.freeu_mode in ("cfg", "cfg-simple") \
                    and latents_rendered is not None:
                r_text, r_image, r_uncond = predict(latents_rendered, t)
                eps = cfg_combine_rendered(
                    e_text, e_image, e_uncond, r_text, r_image, r_uncond,
                    p.guidance_scale, p.image_guidance_scale,
                    p.noise_guidance_scale, p.noise_guidance_scale2,
                    mode=p.freeu_mode)
            else:
                eps = cfg_combine(e_text, e_image, e_uncond,
                                  p.guidance_scale, p.image_guidance_scale)
            latents = self.schedule.step(eps, t, latents)

        return be.decode(latents)

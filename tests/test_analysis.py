"""IG2G analysis utilities: spectra, similarity, DDPM sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ig2g.analysis import (ddpm_sample, image_similarity_matrix,
                                    radial_spectrum, spectrum_similarity)


def test_radial_spectrum_lowpass_vs_noise():
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(1, 64, 64))
    smooth = np.tile(np.linspace(0, 1, 64)[None, None, :], (1, 64, 1))
    rs_n = radial_spectrum(noise)
    rs_s = radial_spectrum(smooth)
    # white noise has flat spectrum; smooth gradient concentrates at DC
    assert rs_n[40:].mean() > rs_s[40:].mean()
    assert spectrum_similarity(noise, noise) > 0.999


def test_similarity_matrix():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 16, 16))
    b = a + rng.normal(scale=0.01, size=a.shape)
    c = rng.normal(size=a.shape)
    m = image_similarity_matrix([a, b, c], metric="cosine")
    assert m[0, 1] > 0.99 and abs(m[0, 2]) < 0.3


def test_ddpm_sampler_with_exact_eps():
    """ε-predictor aimed at a fixed x0 drives sampling toward x0."""
    target = jnp.ones((1, 2, 8, 8)) * 0.37
    from gs2d_tpu.ig2g.ops import DDIMSchedule
    sched = DDIMSchedule()

    def eps(x, t):
        a = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)

    out = ddpm_sample(eps, target.shape, jax.random.PRNGKey(0),
                      num_steps=50, schedule=sched)
    assert float(jnp.abs(out - target).mean()) < 0.05

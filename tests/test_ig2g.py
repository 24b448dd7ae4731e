"""IG2G diffusion-editing math + stub-backend edit pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from gs2d_tpu.ig2g.ip2p import InstructPix2Pix, IP2PParams
from gs2d_tpu.ig2g.ops import (DDIMSchedule, cfg_combine,
                               cfg_combine_rendered, fft_band,
                               fuse_skip_residuals, normalize_latent_noise)


def test_fft_band_partition():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)).astype(np.float32))
    lo = fft_band(x, 0.5, is_low=True)
    hi = fft_band(x, 0.5, is_low=False)
    np.testing.assert_allclose(np.asarray(lo + hi), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # low band of a constant image is the image itself
    c = jnp.ones((1, 1, 16, 16))
    np.testing.assert_allclose(np.asarray(fft_band(c, 0.5, True)), 1.0,
                               atol=1e-5)


def test_normalize_latent_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(2, 4, 16, 16)) * 5 + 3)
                    .astype(np.float32))
    n = normalize_latent_noise(x)
    assert abs(float(n.mean())) < 1e-5
    assert abs(float(n.std()) - 1.0) < 0.01
    nc = normalize_latent_noise(x, use_outlier_clipping=True)
    assert float(jnp.abs(nc).max()) <= 3.0
    ns = normalize_latent_noise(x, use_scaling=True)
    assert float(ns.min()) >= -1.0 - 1e-5 and float(ns.max()) <= 1.0 + 1e-5


def test_ddim_roundtrip_with_perfect_eps():
    """With the exact ε-predictor, DDIM walks back to the t=alpha[0]
    marginal — NOT to x0 exactly: the fork's scheduler config has
    set_alpha_to_one=false (final_alpha_cumprod = alphas_cumprod[0]), so
    the last step keeps a sqrt(1-a0)·ε term. DDIM with exact ε preserves
    the noise direction, so the expected endpoint is closed-form."""
    sched = DDIMSchedule()
    sched.set_timesteps(20, effective_train_timesteps=900)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t0 = int(sched.timesteps[0])
    x = sched.add_noise(x0, noise, t0)
    for t in sched.timesteps:
        a = sched.alphas_cumprod[int(t)]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        x = sched.step(eps, int(t), x)
    a0 = sched.alphas_cumprod[0]
    expected = jnp.sqrt(a0) * x0 + jnp.sqrt(1.0 - a0) * noise
    np.testing.assert_allclose(np.asarray(x), np.asarray(expected),
                               rtol=1e-3, atol=1e-4)
    # and the endpoint is within the final-alpha band of x0
    assert float(jnp.max(jnp.abs(x - x0))) < 0.2


def test_cfg_combiners():
    z = jnp.zeros((1, 4, 4, 4))
    o = jnp.ones((1, 4, 4, 4))
    # guidance scales 1/1 with text==image==uncond collapses to the pred
    out = cfg_combine(o, o, o, 7.5, 1.5)
    np.testing.assert_allclose(np.asarray(out), 1.0)
    out2 = cfg_combine_rendered(o, o, o, z, z, z, 7.5, 1.5, 0.0, 0.0,
                                mode="cfg")
    np.testing.assert_allclose(np.asarray(out2), 1.0)
    assert float(fuse_skip_residuals(z, o, 0.25).mean()) == 0.25


def test_stub_edit_pulls_toward_condition():
    """The stub editor's ε points at image_cond, so editing a rendered
    image toward an original must reduce their distance."""
    rng = np.random.default_rng(0)
    rendered = jnp.asarray(rng.random((1, 3, 32, 32)).astype(np.float32))
    original = jnp.asarray(rng.random((1, 3, 32, 32)).astype(np.float32))
    noise = jnp.asarray(rng.random((1, 3, 32, 32)).astype(np.float32))
    for noise_type in ("None", "encoded", "encoded-normalized", "concat"):
        ip2p = InstructPix2Pix(IP2PParams(noise_type=noise_type,
                                          guidance_scale=1.0,
                                          image_guidance_scale=1.0),
                               backend="stub", seed=1)
        edited = ip2p.edit_image(None, rendered, original, noise)
        d_before = float(jnp.abs(rendered - original).mean())
        d_after = float(jnp.abs(edited - original).mean())
        assert d_after < d_before * 0.5, (noise_type, d_before, d_after)


def test_stub_edit_noise_calibration_runs():
    rng = np.random.default_rng(0)
    rendered = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
    original = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
    noise = jnp.asarray(rng.random((1, 3, 16, 16)).astype(np.float32))
    ip2p = InstructPix2Pix(IP2PParams(is_noise_calibration=True,
                                      guidance_scale=1.0,
                                      image_guidance_scale=1.0),
                           backend="stub")
    edited = ip2p.edit_image(None, rendered, original, noise)
    assert np.isfinite(np.asarray(edited)).all()


def test_pipeline_config_builds_editor():
    from gs2d_tpu.ig2g.pipeline import IG2GPipelineConfig, build_editor

    cfg = IG2GPipelineConfig(text_prompt="make it snowy",
                             noise_type="rendered",
                             guidance_scale=9.0,
                             diffusion_steps=5)
    ed = build_editor(cfg)
    assert isinstance(ed, InstructPix2Pix)
    # pipeline-level knobs must flow into the editor params
    assert ed.p.noise_type == "rendered"
    assert ed.p.guidance_scale == 9.0
    assert ed.p.diffusion_steps == 5
    # schedule defaults mirror the reference IDU cadence
    assert cfg.ip2p_start_iter == 20_000 and cfg.ip2p_cycle_iter == 2_500

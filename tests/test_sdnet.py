"""SD UNet/VAE architecture tests (tiny random configs — the image is
zero-egress, so pretrained checkpoints are gated behind $GS2D_SD_WEIGHTS;
these tests prove the full architecture executes and the fork's
intermediate/fused/FreeU contracts hold).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.ig2g.ip2p import IP2PParams, InstructPix2Pix, JaxSDBackend
from gs2d_tpu.ig2g.sdnet import (FreeUParams, TINY_UNET, init_params,
                                 unet_apply, unet_apply_fused,
                                 unet_apply_intermediate,
                                 unet_param_shapes)
from gs2d_tpu.ig2g.vae import (SD_LATENT_SCALE, TINY_VAE, vae_decode,
                               vae_encode, vae_param_shapes)


@pytest.fixture(scope="module")
def unet_p():
    return init_params(unet_param_shapes(TINY_UNET), jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def vae_p():
    return init_params(vae_param_shapes(TINY_VAE), jax.random.PRNGKey(1))


def _sample(b=3, h=16, w=16):
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (b, TINY_UNET.in_channels, h, w))
    ctx = jax.random.normal(jax.random.PRNGKey(8),
                            (b, 5, TINY_UNET.cross_attention_dim))
    return x, ctx


def test_unet_forward_shape(unet_p):
    x, ctx = _sample()
    eps = unet_apply(TINY_UNET, unet_p, x, 100, ctx)
    assert eps.shape == (3, TINY_UNET.out_channels, 16, 16)
    assert bool(jnp.all(jnp.isfinite(eps)))


def test_unet_timestep_matters(unet_p):
    x, ctx = _sample()
    e1 = unet_apply(TINY_UNET, unet_p, x, 10, ctx)
    e2 = unet_apply(TINY_UNET, unet_p, x, 900, ctx)
    assert float(jnp.abs(e1 - e2).max()) > 1e-6


def test_unet_cross_attention_consumes_ctx(unet_p):
    x, ctx = _sample()
    e1 = unet_apply(TINY_UNET, unet_p, x, 100, ctx)
    e2 = unet_apply(TINY_UNET, unet_p, x, 100, ctx + 1.0)
    assert float(jnp.abs(e1 - e2).max()) > 1e-6


def test_fused_lambda0_matches_plain(unet_p):
    """forward_fused with λ=0 ignores the foreign skips entirely
    (res1*(1-0) + res2*0) and must equal the plain forward."""
    x, ctx = _sample()
    x2 = x + 0.5
    skips2 = unet_apply_intermediate(TINY_UNET, unet_p, x2, 100, ctx)
    e_plain = unet_apply(TINY_UNET, unet_p, x, 100, ctx)
    e_fused = unet_apply_fused(TINY_UNET, unet_p, x, skips2, 0.0, 100, ctx)
    np.testing.assert_allclose(np.asarray(e_plain), np.asarray(e_fused),
                               atol=1e-6)


def test_fused_lambda1_uses_foreign_skips(unet_p):
    """λ=1 swaps in the other pass's skips: equals the plain forward IF
    both passes saw the same input, differs when they did not."""
    x, ctx = _sample()
    skips_same = unet_apply_intermediate(TINY_UNET, unet_p, x, 100, ctx)
    e_plain = unet_apply(TINY_UNET, unet_p, x, 100, ctx)
    e_same = unet_apply_fused(TINY_UNET, unet_p, x, skips_same, 1.0, 100,
                              ctx)
    np.testing.assert_allclose(np.asarray(e_plain), np.asarray(e_same),
                               atol=1e-6)
    skips_other = unet_apply_intermediate(TINY_UNET, unet_p, x + 0.5, 100,
                                          ctx)
    e_other = unet_apply_fused(TINY_UNET, unet_p, x, skips_other, 1.0, 100,
                               ctx)
    assert float(jnp.abs(e_other - e_plain).max()) > 1e-6


def test_freeu_changes_output(unet_p):
    x, ctx = _sample()
    e0 = unet_apply(TINY_UNET, unet_p, x, 100, ctx)
    e1 = unet_apply(TINY_UNET, unet_p, x, 100, ctx,
                    freeu=FreeUParams(b1=1.5, b2=1.6, s1=0.5, s2=0.4))
    assert float(jnp.abs(e1 - e0).max()) > 1e-6


def test_vae_roundtrip_shapes(vae_p):
    """512²-image → 64²-latent geometry (×8), scaled down to 64→8 for
    speed: the downsample factor is what the rendered-noise latent path
    depends on (reference ip2p.py:403-504)."""
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 64))
    lat = vae_encode(TINY_VAE, vae_p, img)
    assert lat.shape == (1, 4, 8, 8)          # 64 / 2^3 = 8
    out = vae_decode(TINY_VAE, vae_p, lat)
    assert out.shape == (1, 3, 64, 64)
    assert bool(jnp.all(jnp.isfinite(out)))
    # posterior sample with a key differs from the mode
    lat_s = vae_encode(TINY_VAE, vae_p, img, key=jax.random.PRNGKey(4))
    assert float(jnp.abs(lat_s - lat).max()) > 0


def _jax_backend(unet_p, vae_p):
    return JaxSDBackend(unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
                        unet_params=unet_p, vae_params=vae_p)


@pytest.mark.parametrize("noise_type,freeu_mode", [
    ("None", "None"),
    ("encoded", "None"),
    ("encoded-normalized", "None"),
    ("concat", "None"),
    ("encoded", "intermediate"),
    ("encoded", "intermediate-reverse"),
    ("encoded", "cfg"),
])
def test_edit_image_jax_backend(unet_p, vae_p, noise_type, freeu_mode):
    """The full editing loop through the real (tiny) UNet+VAE: image and
    rendered noise at pixel resolution, diffusion at the VAE-downsampled
    latent resolution — the geometry VERDICT r1 flagged as untested."""
    p = IP2PParams(diffusion_steps=2, noise_type=noise_type,
                   freeu_mode=freeu_mode, noise_guidance_scale=0.5)
    ip2p = InstructPix2Pix(p, backend=_jax_backend(unet_p, vae_p), seed=0)
    H = W = 32                                  # latents are 4x4
    img = jnp.linspace(0, 1, 3 * H * W).reshape(1, 3, H, W)
    cond = img * 0.5
    noise = jnp.ones((1, 3, H, W)) * 0.3
    ctx = jax.random.normal(jax.random.PRNGKey(5),
                            (3, 5, TINY_UNET.cross_attention_dim))
    out = ip2p.edit_image(ctx, img, cond, rendered_noise=noise)
    assert out.shape == (1, 3, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_weight_loader_roundtrip(unet_p, vae_p, tmp_path):
    """Save tiny-config params as a diffusers-layout safetensors snapshot,
    reload through sd_weights, and get identical arrays back."""
    from safetensors.numpy import save_file

    from gs2d_tpu.ig2g import sd_weights

    root = tmp_path / "snapshot"
    for sub, params in (("unet", unet_p), ("vae", vae_p)):
        os.makedirs(root / sub)
        save_file({k: np.asarray(v) for k, v in params.items()},
                  str(root / sub / "diffusion_pytorch_model.safetensors"))
    up = sd_weights.load_unet(str(root), TINY_UNET)
    vp = sd_weights.load_vae(str(root), TINY_VAE)
    for k in unet_p:
        np.testing.assert_array_equal(np.asarray(up[k]),
                                      np.asarray(unet_p[k]))
    for k in vae_p:
        np.testing.assert_array_equal(np.asarray(vp[k]),
                                      np.asarray(vae_p[k]))


def test_weight_loader_shape_mismatch_raises(unet_p, tmp_path):
    from safetensors.numpy import save_file

    from gs2d_tpu.ig2g import sd_weights

    root = tmp_path / "bad"
    os.makedirs(root / "unet")
    bad = {k: np.asarray(v) for k, v in unet_p.items()}
    bad["conv_in.weight"] = bad["conv_in.weight"][:, :1]
    save_file(bad, str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    with pytest.raises(ValueError, match="conv_in.weight"):
        sd_weights.load_unet(str(root), TINY_UNET)


def test_backend_raises_without_weights(monkeypatch):
    monkeypatch.delenv("GS2D_SD_WEIGHTS", raising=False)
    with pytest.raises(FileNotFoundError, match="GS2D_SD_WEIGHTS"):
        JaxSDBackend()


def test_clip_text_encoder_tiny():
    """Causal CLIP text tower: shapes, causality (a later-token change
    must not affect earlier positions), and the 3-row CFG batch layout."""
    from gs2d_tpu.ig2g.clip_text import (TINY_CLIP, PromptEncoder,
                                         clip_param_shapes,
                                         clip_text_apply)
    p = init_params(clip_param_shapes(TINY_CLIP), jax.random.PRNGKey(2))
    ids = jnp.asarray([[1, 5, 9, 3, 0, 0, 0, 2]], jnp.int32)
    emb = clip_text_apply(TINY_CLIP, p, ids)
    assert emb.shape == (1, 8, TINY_CLIP.hidden)
    ids2 = ids.at[0, 5].set(7)
    emb2 = clip_text_apply(TINY_CLIP, p, ids2)
    np.testing.assert_allclose(np.asarray(emb[0, :5]),
                               np.asarray(emb2[0, :5]), atol=1e-6)
    assert float(jnp.abs(emb[0, 5:] - emb2[0, 5:]).max()) > 1e-6

    class FakeTok:
        def __call__(self, prompts, padding=None, max_length=8,
                     truncation=True, return_tensors="np"):
            class R:
                input_ids = np.tile(
                    np.arange(max_length)[None] % TINY_CLIP.vocab_size,
                    (len(prompts), 1))
            return R()

    enc = PromptEncoder(root="", cfg=TINY_CLIP, params=p,
                        tokenizer=FakeTok())
    out = enc.encode("edit the scene")
    assert out.shape == (3, TINY_CLIP.max_positions, TINY_CLIP.hidden)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(out[2]))


def test_sd15_param_counts():
    """The shape specs at the real config must reproduce the published
    SD-1.5 parameter counts (UNet 859.5M — IP2P's 8-channel conv_in adds
    11.5k over vanilla SD's 859.52M; VAE 83.7M; CLIP-L text 123.1M) —
    a structural check that the architecture matches the checkpoint
    without allocating it."""
    from gs2d_tpu.ig2g.clip_text import SD15_CLIP, clip_param_shapes
    from gs2d_tpu.ig2g.sdnet import SD15_IP2P_UNET
    from gs2d_tpu.ig2g.vae import SD15_VAE

    def count(shapes):
        return sum(int(np.prod(s)) for s in shapes.values())

    assert count(unet_param_shapes(SD15_IP2P_UNET)) == 859_532_484
    assert count(vae_param_shapes(SD15_VAE)) == 83_653_863
    assert count(clip_param_shapes(SD15_CLIP)) == 123_060_480

"""Shape/sanity tests for the KL-VAE and CLIP text encoder (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig, sample_from_moments
from prompt_diffusion_tpu.utils.dtypes import fp32_policy


@pytest.fixture(scope="module")
def vae():
    cfg = VAEConfig(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1)
    model = AutoencoderKL(config=cfg, policy=fp32_policy())
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params, cfg


def test_vae_encode_decode_shapes(vae):
    model, params, cfg = vae
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    moments = jax.jit(lambda p, x: model.apply(p, x, method=AutoencoderKL.encode_moments))(params, x)
    # 3 levels → 4x downsample; double_z → 8 channels
    assert moments.shape == (2, 8, 8, 2 * cfg.z_channels)
    z = sample_from_moments(moments, jax.random.PRNGKey(1))
    assert z.shape == (2, 8, 8, cfg.z_channels)
    img = jax.jit(lambda p, z: model.apply(p, z, method=AutoencoderKL.decode))(params, z)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_vae_sample_uses_logvar(vae):
    model, params, _ = vae
    moments = jnp.concatenate(
        [jnp.zeros((1, 8, 8, 4)), jnp.full((1, 8, 8, 4), -30.0)], axis=-1
    )  # mean 0, tiny variance
    z = sample_from_moments(moments, jax.random.PRNGKey(0))
    assert float(jnp.abs(z).max()) < 1e-3


@pytest.fixture(scope="module")
def clip():
    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
                         intermediate_size=128)
    model = CLIPTextModel(config=cfg, policy=fp32_policy())
    ids = jnp.zeros((2, 77), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    return model, params, cfg


def test_clip_shapes(clip):
    model, params, cfg = clip
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, size=(2, 77)), jnp.int32)
    out = jax.jit(model.apply)(params, ids)
    assert out["last_hidden_state"].shape == (2, 77, 64)
    assert out["pooled"].shape == (2, 64)


def test_clip_pooled_anchors_on_first_eot(clip):
    """pooled must come from the FIRST eot position by ID MATCH, not
    argmax of the raw ids — textual-inversion placeholder ids sit above
    the eot id and would hijack an argmax (the HF eos_token_id fix)."""
    model, params, cfg = clip
    eot = 500
    cfg2 = CLIPTextConfig(vocab_size=1000, hidden_size=64, num_layers=2,
                          num_heads=4, intermediate_size=128, eot_token_id=eot)
    model2 = CLIPTextModel(config=cfg2, policy=fp32_policy())
    ids = np.full((1, 77), 7, np.int32)
    ids[0, 3] = 999  # "TI token": id ABOVE eot
    ids[0, 5] = eot  # first eot
    ids[0, 6:] = eot
    out = jax.jit(model2.apply)(params, jnp.asarray(ids))
    # reference anchor: hidden state at position 5 (first eot), not 3
    np.testing.assert_array_equal(
        np.asarray(out["pooled"][0]),
        np.asarray(out["last_hidden_state"][0, 5]))
    assert not np.array_equal(np.asarray(out["pooled"][0]),
                              np.asarray(out["last_hidden_state"][0, 3]))


def test_clip_causality(clip):
    """Changing a later token must not affect earlier positions (causal mask)."""
    model, params, _ = clip
    rng = np.random.default_rng(1)
    ids = np.asarray(rng.integers(1, 999, size=(1, 77)), np.int32)
    ids2 = ids.copy()
    ids2[0, 50] = (ids2[0, 50] + 1) % 999 + 1
    f = jax.jit(model.apply)
    # compare pre-final-LN? final LN is positionwise so causality still holds
    out1 = f(params, jnp.asarray(ids))["last_hidden_state"]
    out2 = f(params, jnp.asarray(ids2))["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out1[:, :50]), np.asarray(out2[:, :50]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 50:]), np.asarray(out2[:, 50:]))


def test_tokenizer_fallback():
    from prompt_diffusion_tpu.data.tokenizer import HashTokenizer, load_tokenizer, SOT, EOT

    tok = load_tokenizer(None)
    assert isinstance(tok, HashTokenizer)
    ids = tok(["a photo of a cat", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == SOT
    assert ids[1, 1] == EOT
    # deterministic
    ids2 = tok(["a photo of a cat", ""])
    np.testing.assert_array_equal(ids, ids2)

"""SD3 (MMDiT flow-matching) stack tests on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

POL = fp32_policy()
TCFG = MMDiTConfig(
    sample_size=8, patch_size=2, in_channels=4, num_layers=2,
    attention_head_dim=16, num_attention_heads=4, joint_attention_dim=64,
    caption_projection_dim=64, pooled_projection_dim=64, out_channels=4,
    pos_embed_max_size=16,
)
CCFG = MMDiTConfig(
    sample_size=8, patch_size=2, in_channels=4, num_layers=2,
    attention_head_dim=16, num_attention_heads=4, joint_attention_dim=64,
    caption_projection_dim=64, pooled_projection_dim=64, out_channels=4,
    pos_embed_max_size=16,
)


@pytest.fixture(scope="module")
def sd3():
    pipe = PromptDiffusionSD3(
        transformer=SD3Transformer(config=TCFG, policy=POL),
        controlnet=SD3ControlNet(config=CCFG, policy=POL),
        down_proj=SupportPairDownProj(policy=POL),
        vae=AutoencoderKL(
            config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                             z_channels=4, scale_factor=1.5305, shift_factor=0.0609),
            policy=POL,
        ),
        clip_l=CLIPTextModel(
            config=CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64), policy=POL),
        clip_g=CLIPTextModel(
            config=CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64), policy=POL),
        t5=None,
    )
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 10, 64))
    pooled = jnp.zeros((1, 64))
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.zeros((1, 77), jnp.int32)
    params = {
        "transformer": jax.jit(pipe.transformer.init)(rng, lat, t, ctx, pooled),
        "controlnet": jax.jit(pipe.controlnet.init)(rng, lat, t, lat, lat, ctx, pooled),
        "down_proj": jax.jit(pipe.down_proj.init)(rng, img, img),
        "vae": jax.jit(pipe.vae.init)(rng, img),
        "clip_l": jax.jit(pipe.clip_l.init)(rng, ids),
        "clip_g": jax.jit(pipe.clip_g.init)(rng, ids),
    }
    return pipe, params


def test_transformer_shapes(sd3):
    pipe, params = sd3
    lat = jnp.ones((2, 8, 8, 4)) * 0.1
    out = jax.jit(pipe.transformer.apply)(
        params["transformer"], lat, jnp.asarray([10.0, 500.0]),
        jnp.ones((2, 10, 64)), jnp.ones((2, 64)),
    )
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_taps_zero_at_init(sd3):
    pipe, params = sd3
    lat = jnp.ones((1, 8, 8, 4))
    taps = jax.jit(pipe.controlnet.apply)(
        params["controlnet"], lat, jnp.asarray([10.0]), lat, lat,
        jnp.ones((1, 10, 64)), jnp.ones((1, 64)),
    )
    assert len(taps) == 2
    assert all(float(jnp.abs(t).max()) == 0.0 for t in taps)
    # zero taps → controlled transformer == plain transformer
    plain = jax.jit(pipe.transformer.apply)(
        params["transformer"], lat, jnp.asarray([10.0]), jnp.ones((1, 10, 64)), jnp.ones((1, 64)))
    ctrl = pipe.transformer.apply(
        params["transformer"], lat, jnp.asarray([10.0]), jnp.ones((1, 10, 64)),
        jnp.ones((1, 64)), block_controlnet_hidden_states=taps)
    np.testing.assert_allclose(np.asarray(ctrl), np.asarray(plain), atol=1e-6)


def test_sd3_generate_smoke(sd3):
    pipe, params = sd3
    gen = pipe.jit_generate()
    ids = {"l": jnp.zeros((1, 77), jnp.int32), "g": jnp.zeros((1, 77), jnp.int32)}
    img = jnp.zeros((1, 64, 64, 3))
    out = gen(params, jax.random.PRNGKey(0), ids, ids, img, img, img,
              num_steps=2, guidance_scale=7.0)
    arr = np.asarray(out)
    assert arr.shape == (1, 64, 64, 3)
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1

    out2 = gen(params, jax.random.PRNGKey(0), ids, ids, img, img, img,
               num_steps=2, guidance_scale=7.0)
    np.testing.assert_array_equal(arr, np.asarray(out2))


def test_sd3_train_step(sd3):
    from prompt_diffusion_tpu.training.sd3 import (
        SD3TrainConfig, init_sd3_train_state, make_sd3_optimizer, make_sd3_train_step)

    pipe, params = sd3
    cfg = SD3TrainConfig(use_ema=True)
    tx = make_sd3_optimizer(cfg)
    state = init_sd3_train_state(cfg, params, tx)
    frozen = {k: params[k] for k in ("transformer", "vae", "clip_l", "clip_g")}
    step = jax.jit(make_sd3_train_step(pipe, cfg, tx))
    batch = {
        "image": jnp.zeros((2, 64, 64, 3)),
        "control": jnp.zeros((2, 64, 64, 3)),
        "support_cond": jnp.zeros((2, 64, 64, 3)),
        "support_image": jnp.zeros((2, 64, 64, 3)),
        "context": jnp.zeros((2, 10, 64)),
        "pooled": jnp.zeros((2, 64)),
    }
    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert int(new_state.step) == 1
    # only controlnet/down_proj train; a second step changes the loss params
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.trainable, new_state.trainable)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_sd3_staged_t5_matches_in_graph(sd3):
    """Staged T5 (encode once via `encode_t5`, feed `t5_seq=`) must produce
    byte-identical images to running T5 inside the generate graph — the
    16 GB-chip deployment path for the triple-encoder configuration
    (reference encode_prompt :351-543 runs T5 in-process)."""
    import dataclasses

    from prompt_diffusion_tpu.models.t5_text import T5Config, T5Encoder

    pipe, params = sd3
    t5 = T5Encoder(config=T5Config(vocab_size=50, d_model=64, d_kv=8, d_ff=96,
                                   num_layers=2, num_heads=4), policy=POL)
    ids_t5 = jnp.arange(8, dtype=jnp.int32)[None, :] % 50
    params_t5 = dict(params, t5=jax.jit(t5.init)(jax.random.PRNGKey(3), ids_t5))
    pipe_t5 = dataclasses.replace(pipe, t5=t5)

    ids = {"l": jnp.zeros((1, 77), jnp.int32), "g": jnp.zeros((1, 77), jnp.int32)}
    ids_in = dict(ids, t5=ids_t5)
    img = jnp.zeros((1, 64, 64, 3))

    in_graph = pipe_t5.jit_generate()(
        params_t5, jax.random.PRNGKey(0), ids_in, ids_in, img, img, img,
        num_steps=2, guidance_scale=7.0)

    t5_seq = PromptDiffusionSD3.encode_t5(t5, params_t5["t5"], ids_t5)
    staged = pipe.jit_generate()(
        params, jax.random.PRNGKey(0), ids, ids, img, img, img,
        num_steps=2, guidance_scale=7.0, t5_seq=t5_seq, neg_t5_seq=t5_seq)

    assert float(jnp.abs(t5_seq).max()) > 0  # T5 actually contributes
    np.testing.assert_allclose(
        np.asarray(staged), np.asarray(in_graph), atol=1e-6)

"""make_it_fit, long-prompt encoding, profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_make_it_fit_cyclic():
    from prompt_diffusion_tpu.tools.torch_import import make_it_fit

    src = {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    tmpl = {"a": {"kernel": np.zeros((4, 3), np.float32)}, "b": {"bias": np.zeros(2)}}
    out = make_it_fit(src, tmpl)
    np.testing.assert_array_equal(out["a"]["kernel"][:2], src["a"]["kernel"])
    np.testing.assert_array_equal(out["a"]["kernel"][2:], src["a"]["kernel"])  # cycled
    assert out["b"]["bias"] is None  # missing in source


def test_long_prompt_encoding_shape():
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy

    pol = fp32_policy()
    pipe = PromptDiffusionSD15(
        unet=UNetSD15(config=UNetConfig(model_channels=32, channel_mult=(1, 2),
                                        num_res_blocks=1, attention_resolutions=(1,),
                                        num_heads=4, context_dim=64), policy=pol),
        controlnet=None, vae=None,
        text_encoder=CLIPTextModel(
            config=CLIPTextConfig(vocab_size=49408, hidden_size=64, num_layers=2,
                                  num_heads=4, intermediate_size=128), policy=pol),
        schedule=DiffusionSchedule.create(),
    )
    ids = jnp.zeros((2, 77), jnp.int32)
    params = {"clip": jax.jit(pipe.text_encoder.init)(jax.random.PRNGKey(0), ids)}
    out = pipe.encode_long_prompt(params, ids, windows=3)
    assert out.shape == (2, 3 * 77, 64)
    # clip_skip variant
    out2 = pipe.encode_long_prompt(params, ids, windows=2, clip_skip=1)
    assert out2.shape == (2, 2 * 77, 64)
    assert not np.allclose(np.asarray(out[:, :77]), np.asarray(out2[:, :77]))


def test_step_timer():
    from prompt_diffusion_tpu.utils.profiling import StepTimer

    t = StepTimer(skip_first=1)
    for s in (0.1, 0.02, 0.03, 0.04):
        t.record(s)
    stats = t.stats()
    assert stats["steps"] == 3  # first skipped
    assert stats["p50_ms"] == pytest.approx(30.0, rel=0.01)


def test_fast_random_params_matches_init_tree():
    """eval_shape-based fast init must produce the exact tree structure,
    shapes, and dtype rule of jit(cast_params_bf16(module.init)) — it is a
    drop-in for the bench's T5-XXL init (which otherwise compiles the full
    forward pass just to make random weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prompt_diffusion_tpu.models.t5_text import T5Config, T5Encoder
    from prompt_diffusion_tpu.utils.dtypes import (
        cast_params_bf16,
        fast_random_params_bf16,
    )

    cfg = T5Config(vocab_size=64, d_model=32, num_layers=2, num_heads=4,
                   d_ff=48, d_kv=8)
    t5 = T5Encoder(config=cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    ref = cast_params_bf16(t5.init(jax.random.PRNGKey(0), ids))
    fast = fast_random_params_bf16(t5, jax.random.PRNGKey(0), ids)
    ref_l, ref_td = jax.tree_util.tree_flatten(ref)
    fast_l, fast_td = jax.tree_util.tree_flatten(fast)
    assert ref_td == fast_td
    for r, f in zip(ref_l, fast_l):
        assert r.shape == f.shape and r.dtype == f.dtype
    # the filled tree must run the encoder to finite outputs
    out = t5.apply(fast, ids)
    assert np.isfinite(np.asarray(out, np.float32)).all()

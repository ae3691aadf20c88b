"""int8 W8A8 serving-mode tests (ops/quant.py + policy routing).

Quantization error bounds are statistical, not exact: per-channel weights
+ per-tensor dynamic activations give ~1% relative error per layer on
well-conditioned inputs. The e2e test checks the int8 tiny pipeline stays
close to the bf16 one in image space.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.ops.quant import QuantConv, QuantDense
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, fp32_policy, int8_policy


def _rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)


def test_quant_dense_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 320)), jnp.float32)
    m = QuantDense(128, out_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    ref = x @ w + b
    assert _rel_err(got, ref) < 0.02


def test_quant_dense_pre_scale():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    m = QuantDense(32, use_bias=False, pre_scale=0.125, out_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)
    ref = (x @ params["params"]["kernel"]) * 0.125
    assert _rel_err(got, ref) < 0.02


def test_quant_conv_close_to_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)), jnp.float32)
    m = QuantConv(32, kernel_size=(3, 3), padding=1, out_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, params["params"]["kernel"].shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        x, params["params"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn) + params["params"]["bias"]
    assert _rel_err(got, ref) < 0.03


def test_quant_conv_zero_weights_exact_zero():
    """Fresh zero-convs must stay EXACTLY zero through quantization
    (zero-init ControlNet taps are a correctness contract, not a tolerance)."""
    x = jnp.ones((1, 8, 8, 16))
    m = QuantConv(8, kernel_size=(1, 1), zero_init=True, use_bias=True,
                  out_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(np.asarray(out)))


def test_param_tree_identical_to_bf16():
    """int8 and bf16 policies must init bit-identical param trees, so one
    imported checkpoint serves both modes."""
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1,), num_heads=4, context_dim=64)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    p_bf16 = UNetSD15(config=cfg).init(jax.random.PRNGKey(0), x, t, ctx)
    p_int8 = UNetSD15(config=cfg, policy=int8_policy()).init(
        jax.random.PRNGKey(0), x, t, ctx)
    s_bf16 = jax.tree_util.tree_structure(p_bf16)
    s_int8 = jax.tree_util.tree_structure(p_int8)
    assert s_bf16 == s_int8
    for a, b in zip(jax.tree_util.tree_leaves(p_bf16),
                    jax.tree_util.tree_leaves(p_int8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_unet_close_to_fp32_unet():
    """Whole tiny UNet with live weights: int8 output tracks fp32 within a
    few percent relative error."""
    from tests.test_pipeline_sd15 import _perturb_zero_init
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1,), num_heads=4, context_dim=64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(2, 77, 64)), jnp.float32)
    params = _perturb_zero_init(
        UNetSD15(config=cfg).init(jax.random.PRNGKey(0), x, t, ctx), scale=0.05)
    ref = UNetSD15(config=cfg, policy=fp32_policy()).apply(params, x, t, ctx)
    got = UNetSD15(
        config=cfg,
        policy=DTypePolicy(compute_dtype=jnp.float32, quant="int8"),
    ).apply(params, x, t, ctx)
    assert np.isfinite(np.asarray(got)).all()
    assert _rel_err(got, ref) < 0.12


def test_sd3_jointblock_int8_close_and_tree_identical():
    """SD3 JointBlock: int8 policy keeps the param tree identical and the
    output within a few percent of fp32."""
    from prompt_diffusion_tpu.models.mmdit_sd3 import JointBlock, MMDiTConfig
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy

    cfg = MMDiTConfig(num_layers=2, num_attention_heads=4, attention_head_dim=16,
                      joint_attention_dim=64, pooled_projection_dim=64)
    rng = np.random.default_rng(7)
    hidden = jnp.asarray(rng.normal(size=(2, 64, 64)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 8, 64)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)

    blk32 = JointBlock(config=cfg, policy=fp32_policy())
    params = blk32.init(jax.random.PRNGKey(0), hidden, ctx, emb)
    # live projections (AdaLN proj is zero-init -> gates are 0 otherwise)
    from tests.test_pipeline_sd15 import _perturb_zero_init

    params = _perturb_zero_init(params, scale=0.05)
    ref_h, ref_c = blk32.apply(params, hidden, ctx, emb)

    blk8 = JointBlock(config=cfg,
                      policy=DTypePolicy(compute_dtype=jnp.float32, quant="int8"))
    p8 = blk8.init(jax.random.PRNGKey(0), hidden, ctx, emb)
    assert jax.tree_util.tree_structure(p8) == jax.tree_util.tree_structure(
        blk32.init(jax.random.PRNGKey(0), hidden, ctx, emb))
    got_h, got_c = blk8.apply(params, hidden, ctx, emb)
    assert _rel_err(got_h, ref_h) < 0.05
    assert _rel_err(got_c, ref_c) < 0.05


def test_int8_pipeline_image_distribution():
    """e2e distributional check (VERDICT r2 #2, CPU tier of the on-chip
    protocol in scripts/int8_quality.py): full tiny pipeline, identical
    x_T per mode, pairwise SSIM between fp32 and int8 images must stay
    high and the per-image relative pixel error bounded — int8 is a
    serving mode, not a different model."""
    from prompt_diffusion_tpu.evaluation.ssim import batch_ssim
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy
    from tests.test_pipeline_sd15 import _perturb_zero_init

    def build(policy):
        ucfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                          attention_resolutions=(1,), num_heads=4, context_dim=64)
        return PromptDiffusionSD15(
            unet=UNetSD15(config=ucfg, policy=policy),
            controlnet=ControlNetSD15(config=ucfg, hint_channels=6, policy=policy),
            vae=AutoencoderKL(config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2),
                                               num_res_blocks=1), policy=policy),
            text_encoder=CLIPTextModel(
                config=CLIPTextConfig(vocab_size=100, hidden_size=64, num_layers=2,
                                      num_heads=4, intermediate_size=128),
                policy=policy),
            schedule=DiffusionSchedule.create(),
        )

    pipe_ref = build(fp32_policy())
    pipe_i8 = build(DTypePolicy(compute_dtype=jnp.float32, quant="int8"))
    params = _perturb_zero_init(
        jax.jit(lambda r: pipe_ref.init_params(r, image_size=64))(jax.random.PRNGKey(0)),
        scale=0.05)

    b, n = 4, 8
    rng = np.random.default_rng(11)
    ids = jnp.zeros((b, 77), jnp.int32)
    pair = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 6)), jnp.float32)
    query = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32)

    def gen_all(pipe):
        g = pipe.jit_generate()
        outs = []
        for i in range(n // b):
            noise = jnp.asarray(
                np.random.default_rng(100 + i).normal(size=(b, 8, 8, 4)), jnp.float32)
            outs.append(np.asarray(
                g(params, jax.random.PRNGKey(0), ids, ids, pair, query,
                  num_steps=8, guidance_scale=9.0, init_noise=noise)))
        return np.concatenate(outs)

    a = gen_all(pipe_ref)
    c = gen_all(pipe_i8)

    ssims = batch_ssim(a, c)
    rels = np.asarray([
        float(np.linalg.norm(x - y) / (np.linalg.norm(x) + 1e-9))
        for x, y in zip(a, c)])
    # distributional acceptance: every image recognizably the same sample
    assert float(np.median(ssims)) > 0.85, ssims
    assert float(ssims.min()) > 0.7, ssims
    assert float(np.median(rels)) < 0.15, rels


def test_int8_vae_decode_close_and_tree_identical():
    """VAE with int8 policy: interior convs quantize (QuantConv param tree
    == nn.Conv), boundary convs stay bf16; decode stays close to the bf16
    decode on a tiny config."""
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    vae_bf16 = AutoencoderKL(config=cfg)
    vae_int8 = AutoencoderKL(config=cfg, policy=int8_policy())
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    p_bf16 = vae_bf16.init(jax.random.PRNGKey(1), z, method=AutoencoderKL.decode)
    p_int8 = vae_int8.init(jax.random.PRNGKey(1), z, method=AutoencoderKL.decode)
    assert jax.tree_util.tree_structure(p_bf16) == jax.tree_util.tree_structure(p_int8)
    for a, b in zip(jax.tree_util.tree_leaves(p_bf16), jax.tree_util.tree_leaves(p_int8)):
        assert a.shape == b.shape and a.dtype == b.dtype

    out_b = vae_bf16.apply(p_bf16, z, method=AutoencoderKL.decode)
    out_i = vae_int8.apply(p_bf16, z, method=AutoencoderKL.decode)
    assert out_i.dtype == out_b.dtype
    err = _rel_err(np.asarray(out_i, np.float32), np.asarray(out_b, np.float32))
    assert err < 0.15, err


def test_sd3_int8_pipeline_smoke_close_to_fp32():
    """Tiny SD3 stack through the PUBLIC pipeline in the int8 serving
    policy (exercises the fused AdaLN + fused GELU/row-quant wiring end
    to end): identical inputs, images finite/bounded and close to fp32."""
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.models.controlnet_sd3 import (
        SD3ControlNet, SupportPairDownProj)
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3

    cfg = MMDiTConfig(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2,
        attention_head_dim=16, num_attention_heads=4, joint_attention_dim=64,
        caption_projection_dim=64, pooled_projection_dim=64, out_channels=4,
        pos_embed_max_size=16,
    )

    def build(policy):
        return PromptDiffusionSD3(
            transformer=SD3Transformer(config=cfg, policy=policy),
            controlnet=SD3ControlNet(config=cfg, policy=policy),
            down_proj=SupportPairDownProj(policy=policy),
            vae=AutoencoderKL(config=VAEConfig(
                ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1, z_channels=4,
                scale_factor=1.5305, shift_factor=0.0609), policy=policy),
            clip_l=CLIPTextModel(config=CLIPTextConfig(
                vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64), policy=policy),
            clip_g=CLIPTextModel(config=CLIPTextConfig(
                vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64), policy=policy),
            t5=None,
        )

    ids = {"l": jnp.zeros((2, 77), jnp.int32), "g": jnp.zeros((2, 77), jnp.int32)}
    img = jnp.zeros((2, 64, 64, 3))
    pipe32 = build(fp32_policy())
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 10, 64))
    pooled = jnp.zeros((1, 64))
    img1 = jnp.zeros((1, 64, 64, 3))
    ids1 = jnp.zeros((1, 77), jnp.int32)
    params = {
        "transformer": jax.jit(pipe32.transformer.init)(rng, lat, t, ctx, pooled),
        "controlnet": jax.jit(pipe32.controlnet.init)(rng, lat, t, lat, lat, ctx, pooled),
        "down_proj": jax.jit(pipe32.down_proj.init)(rng, img1, img1),
        "vae": jax.jit(pipe32.vae.init)(rng, img1),
        "clip_l": jax.jit(pipe32.clip_l.init)(rng, ids1),
        "clip_g": jax.jit(pipe32.clip_g.init)(rng, ids1),
    }
    out32 = pipe32.jit_generate()(params, jax.random.PRNGKey(1), ids, ids,
                                  img, img, img, num_steps=2, guidance_scale=7.0)

    pipe8 = build(int8_policy())
    # param trees are identical by construction — reuse the fp32 params
    out8 = pipe8.jit_generate()(params, jax.random.PRNGKey(1), ids, ids,
                                img, img, img, num_steps=2, guidance_scale=7.0)
    a32, a8 = np.asarray(out32, np.float32), np.asarray(out8, np.float32)
    assert a8.shape == a32.shape == (2, 64, 64, 3)
    assert np.isfinite(a8).all() and a8.min() >= 0.0 and a8.max() <= 1.0
    rel = np.abs(a8 - a32).mean() / (np.abs(a32 - a32.mean()).mean() + 1e-6)
    assert rel < 0.35, rel  # int8 is a serving mode of the SAME model


def test_int8_vit_annotators_close_and_tree_identical():
    """Round-5 int8 ViT mode for the annotators: DPT-Hybrid / UniFormer
    SABlock dense stacks swap to QuantDense under int8_policy with an
    IDENTICAL param tree (checkpoints load into either mode), and the
    tiny-net outputs stay within a few percent of bf16."""
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.annotators.midas import DPTHybridConfig, DPTHybridDepth
    from prompt_diffusion_tpu.utils.dtypes import default_policy, int8_policy

    cfg = DPTHybridConfig(hidden_size=64, num_layers=2, num_heads=4,
                          hooks=(0, 1), resnet_layers=(1, 1, 1),
                          reassemble_dims=(32, 64, 64, 64), features=32,
                          pos_grid=4)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    net_bf16 = DPTHybridDepth(config=cfg, policy=default_policy())
    net_int8 = DPTHybridDepth(config=cfg, policy=int8_policy())
    p = net_bf16.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        net_int8.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(p)
    ref = net_bf16.apply(p, x)
    got = net_int8.apply(p, x)
    assert np.isfinite(np.asarray(got)).all()
    assert _rel_err(got, ref) < 0.08

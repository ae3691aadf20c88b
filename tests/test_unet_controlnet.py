"""Shape/structure tests for the SD1.5 UNet + ControlNet on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

TINY = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    num_heads=4,
    context_dim=64,
)


@pytest.fixture(scope="module")
def models_and_params():
    unet = UNetSD15(config=TINY, policy=fp32_policy())
    cnet = ControlNetSD15(config=TINY, hint_channels=6, policy=fp32_policy())
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 64))
    pair = jnp.zeros((2, 128, 128, 6))
    query = jnp.zeros((2, 128, 128, 3))
    # jit the inits: one XLA program instead of one compile per param
    uparams = jax.jit(unet.init)(rng, x, t, ctx)
    cparams = jax.jit(cnet.init)(rng, x, t, pair, query, ctx)
    unet_apply = jax.jit(unet.apply, static_argnames=("only_mid_control",))
    cnet_apply = jax.jit(cnet.apply, static_argnames=("hint_only",))
    return unet_apply, uparams, cnet_apply, cparams


def test_unet_output_shape(models_and_params):
    unet_apply, uparams, _, _ = models_and_params
    x = jnp.ones((2, 16, 16, 4)) * 0.1
    t = jnp.asarray([10, 500])
    ctx = jnp.ones((2, 7, 64)) * 0.1
    out = unet_apply(uparams, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_residual_stack(models_and_params):
    _, _, cnet_apply, cparams = models_and_params
    x = jnp.ones((2, 16, 16, 4)) * 0.1
    t = jnp.asarray([10, 500])
    ctx = jnp.ones((2, 7, 64)) * 0.1
    pair = jnp.ones((2, 128, 128, 6)) * 0.5
    query = jnp.ones((2, 128, 128, 3)) * 0.5
    ctrl = cnet_apply(cparams, x, t, pair, query, ctx)
    assert len(ctrl) == 13
    # encoder taps: 1 conv + (2 res + 1 down)*3 + 2 res; shapes follow the
    # channel plan of models/cldm_v15.yaml ch_mult (1,2,4,4) at 16x16
    mc = TINY.model_channels
    expected = [
        (16, mc), (16, mc), (16, mc),
        (8, mc), (8, 2 * mc), (8, 2 * mc),
        (4, 2 * mc), (4, 4 * mc), (4, 4 * mc),
        (2, 4 * mc), (2, 4 * mc), (2, 4 * mc),
        (2, 4 * mc),  # middle
    ]
    for c, (hw, ch) in zip(ctrl, expected):
        assert c.shape == (2, hw, hw, ch)
    # fresh init → all zero-conv taps are exactly zero
    assert all(float(jnp.abs(c).max()) == 0.0 for c in ctrl)


def test_controlled_unet_zero_init_control_is_noop(models_and_params):
    """With zero-init ControlNet, controlled UNet output == plain UNet output
    (the ControlNet-init invariance the reference relies on)."""
    unet_apply, uparams, cnet_apply, cparams = models_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([123])
    ctx = jnp.asarray(rng.normal(size=(1, 7, 64)), jnp.float32)
    pair = jnp.asarray(rng.normal(size=(1, 128, 128, 6)), jnp.float32)
    query = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    ctrl = cnet_apply(cparams, x, t, pair, query, ctx)
    out_plain = unet_apply(uparams, x, t, ctx)
    out_ctrl = unet_apply(uparams, x, t, ctx, control=ctrl)
    np.testing.assert_allclose(np.asarray(out_ctrl), np.asarray(out_plain), atol=1e-6)


def test_hoisted_hint_equivalence(models_and_params):
    """controlnet(pair, query) == controlnet(guided_hint=encode(pair, query))."""
    _, _, cnet_apply, cparams = models_and_params
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([42])
    ctx = jnp.asarray(rng.normal(size=(1, 7, 64)), jnp.float32)
    pair = jnp.asarray(rng.normal(size=(1, 128, 128, 6)), jnp.float32)
    query = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    full = cnet_apply(cparams, x, t, pair, query, ctx)
    hint = cnet_apply(cparams, example_pair=pair, query=query, hint_only=True)
    hoisted = cnet_apply(cparams, x, t, context=ctx, guided_hint=hint)
    for a, b in zip(full, hoisted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_only_mid_control(models_and_params):
    unet_apply, uparams, cnet_apply, cparams = models_and_params
    # fresh init has a zero-init out_conv (outputs identically 0), so give
    # it a non-zero kernel to make the control path observable.
    uparams = jax.tree_util.tree_map(lambda x: x, uparams)  # shallow copy
    kern = uparams["params"]["out_conv"]["kernel"]
    uparams["params"]["out_conv"]["kernel"] = jnp.ones_like(kern) * 0.01
    x = jnp.ones((1, 16, 16, 4))
    t = jnp.asarray([5])
    ctx = jnp.ones((1, 7, 64))
    ctrl = [jnp.ones_like(c) for c in cnet_apply(
        cparams, x, t, jnp.ones((1, 128, 128, 6)), jnp.ones((1, 128, 128, 3)), ctx
    )]
    out_mid = unet_apply(uparams, x, t, ctx, control=ctrl, only_mid_control=True)
    out_full = unet_apply(uparams, x, t, ctx, control=ctrl)
    assert not np.allclose(np.asarray(out_mid), np.asarray(out_full))

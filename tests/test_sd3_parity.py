"""SD3 (MMDiT) elementwise torch-parity tests (VERDICT round-1 missing #3).

The reference SD3 stack is diffusers-based (promptdiffusioncontrolnet_sd3.py
+ vendored controlnet_sd3.py); diffusers itself is not installed, so
tests/sd3_torch_fixture.py restates the exact module math in plain torch
with diffusers state_dict names. These tests drive random weights through
`tools.diffusers_import.sd3_*_rules` and require elementwise agreement —
the same pattern test_torch_parity.py proves for the SD1.5 stack. This
validates AdaLN chunk orders, joint-attention concat order/split,
pos-embed cropping + base_size grid scaling, gelu-tanh FF, controlnet tap
scaling, and the import key mapping itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
from prompt_diffusion_tpu.tools.diffusers_import import (
    sd3_controlnet_rules,
    sd3_transformer_rules,
)
from prompt_diffusion_tpu.tools.torch_import import apply_rules
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

from tests.sd3_torch_fixture import SD3ControlNetFixture, SD3TransformerFixture

DIMS = dict(
    sample_size=8,
    patch_size=2,
    in_channels=16,
    attention_head_dim=16,
    num_attention_heads=4,
    joint_attention_dim=32,
    caption_projection_dim=64,
    pooled_projection_dim=48,
    pos_embed_max_size=12,
)


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _inputs(seed, b=2, layers_ctx=5):
    g = np.random.default_rng(seed)
    lat = g.normal(size=(b, 16, 8, 8)).astype(np.float32)
    ctx = g.normal(size=(b, layers_ctx, 32)).astype(np.float32)
    pooled = g.normal(size=(b, 48)).astype(np.float32)
    t = np.array([250.0, 875.0][:b], np.float32)
    return lat, ctx, pooled, t


@pytest.fixture(scope="module")
def tf_pair():
    torch.manual_seed(0)
    fix = SD3TransformerFixture(num_layers=3, **DIMS).eval()
    params = {"params": apply_rules(_np_sd(fix), sd3_transformer_rules(3))}
    cfg = MMDiTConfig(num_layers=3, out_channels=16, **DIMS)
    model = SD3Transformer(config=cfg, policy=fp32_policy())
    return fix, model, params


def test_sd3_transformer_parity(tf_pair):
    fix, model, params = tf_pair
    lat, ctx, pooled, t = _inputs(1)
    with torch.no_grad():
        ref = fix(torch.tensor(lat), torch.tensor(ctx), torch.tensor(pooled),
                  torch.tensor(t)).numpy()
    out = model.apply(params, jnp.asarray(lat.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(pooled))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-3
    )


def test_sd3_transformer_with_control_parity(tf_pair):
    fix, model, params = tf_pair
    lat, ctx, pooled, t = _inputs(2)
    g = np.random.default_rng(3)
    controls = [g.normal(size=(2, 16, 64)).astype(np.float32) * 0.1 for _ in range(2)]
    with torch.no_grad():
        ref = fix(torch.tensor(lat), torch.tensor(ctx), torch.tensor(pooled),
                  torch.tensor(t),
                  block_controlnet_hidden_states=[torch.tensor(c) for c in controls]
                  ).numpy()
    out = model.apply(params, jnp.asarray(lat.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(pooled),
                      block_controlnet_hidden_states=tuple(jnp.asarray(c) for c in controls))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-3
    )


def test_sd3_controlnet_parity():
    torch.manual_seed(1)
    fix = SD3ControlNetFixture(num_layers=2, **DIMS).eval()
    tree = apply_rules(_np_sd(fix), sd3_controlnet_rules(2))
    down = tree.pop("down_proj")
    params = {"params": tree}
    cfg = MMDiTConfig(num_layers=2, out_channels=16, **DIMS)
    model = SD3ControlNet(config=cfg, policy=fp32_policy())

    lat, ctx, pooled, t = _inputs(4)
    g = np.random.default_rng(5)
    cond = g.normal(size=(2, 16, 8, 8)).astype(np.float32)
    pair = g.normal(size=(2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = fix(torch.tensor(lat), torch.tensor(cond), torch.tensor(pair),
                  torch.tensor(ctx), torch.tensor(pooled), torch.tensor(t),
                  conditioning_scale=0.7)
    taps = model.apply(
        params, jnp.asarray(lat.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond.transpose(0, 2, 3, 1)), jnp.asarray(pair.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), jnp.asarray(pooled), conditioning_scale=0.7,
    )
    assert len(taps) == len(ref)
    for ours, theirs in zip(taps, ref):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-4, rtol=1e-3
        )

    # down_proj (encode_support_pair's pixel-space 6→3 mix, :189-198)
    dp = SupportPairDownProj(policy=fp32_policy())
    c3 = g.normal(size=(2, 3, 8, 8)).astype(np.float32)
    i3 = g.normal(size=(2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_dp = fix.down_proj(torch.cat([torch.tensor(c3), torch.tensor(i3)], dim=1)).numpy()
    ours_dp = dp.apply({"params": {"down_proj": down}},
                       jnp.asarray(c3.transpose(0, 2, 3, 1)),
                       jnp.asarray(i3.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours_dp).transpose(0, 3, 1, 2), ref_dp, atol=2e-4, rtol=1e-3
    )

"""Parity vs the REFERENCE'S OWN SD3 source, executed.

VERDICT r2 next-round #4: `tests/sd3_torch_fixture.py` restates diffusers
math — a shared misreading would be invisible. Here the actual reference
file `/root/reference/promptdiffusioncontrolnet_sd3.py` is imported (its
diffusers deps stubbed with the fixture classes, tests/diffusers_stub.py)
and its `SD3PromptDiffusionModel.forward` / `encode_support_pair` are run
directly against our `SD3ControlNet` / `SupportPairDownProj` — the same
gold standard test_torch_parity.py applies to `/root/reference/ldm`.

Covers the PD-specific wiring the fixture could have misread:
  * dual pos_embed_input add (cond AND example-pair cond, :440)
  * per-block Linear taps + conditioning_scale (:470-478)
  * zero_module init of taps + pos_embed_input (:165-176)
  * encode_support_pair's channel-concat + down_proj (:189-198)
"""

import os

import numpy as np
import pytest

REF = "/root/reference/promptdiffusioncontrolnet_sd3.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig
from prompt_diffusion_tpu.tools.diffusers_import import sd3_controlnet_rules
from prompt_diffusion_tpu.tools.torch_import import apply_rules
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

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


@pytest.fixture(scope="module")
def ref_model():
    from tests.diffusers_stub import load_reference_sd3_module

    mod = load_reference_sd3_module(REF)
    torch.manual_seed(0)
    model = mod.SD3PromptDiffusionModel(
        num_layers=2, out_channels=16, extra_conditioning_channels=0, **DIMS
    ).eval()
    return mod, model


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _randomize(model, std=0.1, seed=7):
    """The reference zero-inits taps/pos_embed_input (zero_module) — give
    every parameter random values so parity is non-vacuous."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)


def test_reference_init_zero_taps(ref_model):
    """zero_module semantics straight from the reference source: at init
    every controlnet tap is exactly zero whatever the inputs."""
    _, model = ref_model
    g = np.random.default_rng(0)
    lat = torch.tensor(g.normal(size=(2, 16, 8, 8)).astype(np.float32))
    cond = torch.tensor(g.normal(size=(2, 16, 8, 8)).astype(np.float32))
    pair = torch.tensor(g.normal(size=(2, 16, 8, 8)).astype(np.float32))
    ctx = torch.tensor(g.normal(size=(2, 5, 32)).astype(np.float32))
    pooled = torch.tensor(g.normal(size=(2, 48)).astype(np.float32))
    t = torch.tensor([250.0, 875.0])
    with torch.no_grad():
        taps = model(lat, cond, pair, encoder_hidden_states=ctx,
                     pooled_projections=pooled, timestep=t, return_dict=False)[0]
    assert len(taps) == 2
    assert all(float(s.abs().max()) == 0.0 for s in taps)


def test_reference_forward_parity(ref_model):
    """Our SD3ControlNet == the reference's executed forward, elementwise,
    weights transported through the real import rules."""
    _, model = ref_model
    _randomize(model)
    tree = apply_rules(_np_sd(model), sd3_controlnet_rules(2))
    tree.pop("down_proj")  # pixel-space module, split off in our layout
    params = {"params": tree}
    ours = SD3ControlNet(config=MMDiTConfig(num_layers=2, out_channels=16, **DIMS),
                         policy=fp32_policy())

    g = np.random.default_rng(11)
    lat = g.normal(size=(2, 16, 8, 8)).astype(np.float32)
    cond = g.normal(size=(2, 16, 8, 8)).astype(np.float32)
    pair = g.normal(size=(2, 16, 8, 8)).astype(np.float32)
    ctx = g.normal(size=(2, 5, 32)).astype(np.float32)
    pooled = g.normal(size=(2, 48)).astype(np.float32)
    t = np.array([250.0, 875.0], np.float32)

    with torch.no_grad():
        ref_taps = model(
            torch.tensor(lat), torch.tensor(cond), torch.tensor(pair),
            conditioning_scale=0.7, encoder_hidden_states=torch.tensor(ctx),
            pooled_projections=torch.tensor(pooled), timestep=torch.tensor(t),
            return_dict=False,
        )[0]
    taps = ours.apply(
        params, jnp.asarray(lat.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond.transpose(0, 2, 3, 1)), jnp.asarray(pair.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), jnp.asarray(pooled), conditioning_scale=0.7,
    )
    assert len(taps) == len(ref_taps)
    for a, b in zip(taps, ref_taps):
        assert float(np.abs(b.numpy()).max()) > 0  # non-vacuous
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=3e-4, rtol=1e-3)


def test_reference_encode_support_pair_parity(ref_model):
    """encode_support_pair (:189-198): channel concat (cond first) +
    down_proj conv, vs our SupportPairDownProj."""
    _, model = ref_model
    _randomize(model, seed=9)
    tree = apply_rules(_np_sd(model), sd3_controlnet_rules(2))
    down = tree.pop("down_proj")

    g = np.random.default_rng(13)
    cond = g.normal(size=(2, 3, 8, 8)).astype(np.float32)
    gt = g.normal(size=(2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = model.encode_support_pair(
            torch.tensor(cond), torch.tensor(gt), vae=None).numpy()
    dp = SupportPairDownProj(policy=fp32_policy())
    out = dp.apply({"params": {"down_proj": down}},
                   jnp.asarray(cond.transpose(0, 2, 3, 1)),
                   jnp.asarray(gt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4, rtol=1e-3)

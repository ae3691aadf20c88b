"""DDIM inversion (encode/decode) and FreeU tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.schedulers.ddim import (
    DDIMTables,
    ddim_decode_loop,
    ddim_encode_loop,
    stochastic_encode,
)
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule

pytestmark = pytest.mark.slow  # multi-minute on CPU; fast tier: -m 'not slow'

SCHED = DiffusionSchedule.create()


def test_ddim_encode_decode_roundtrip():
    """On the exact linear ε-field, encode→decode must return near x0."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32) * 0.3
    eps_c = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)

    def eps_fn(x, t):
        a = SCHED.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = SCHED.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    tables = DDIMTables.create(SCHED, 20)
    t_enc = 15
    # start at ᾱ₀ state of x0 (what a VAE latent looks like)
    a0 = float(SCHED.sqrt_alphas_cumprod[0])
    s0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])
    x_start = a0 * x0 + s0 * eps_c
    x_enc = ddim_encode_loop(eps_fn, x_start, tables, t_enc)
    # inversion must actually move the state (the reference evaluates ε at
    # the destination timestep — ddim_hacked.py:236-275 — so per-step noise
    # levels are approximate, not analytic; don't assert them)
    assert float(jnp.abs(x_enc - x_start).max()) > 0.1
    x_dec = ddim_decode_loop(eps_fn, x_enc, tables, t_enc)
    # encode∘decode is approximately identity (shared discretization quirk)
    np.testing.assert_allclose(np.asarray(x_dec), np.asarray(x_start), atol=0.12)


def test_stochastic_encode_noise_level():
    tables = DDIMTables.create(SCHED, 50)
    x0 = jnp.zeros((1, 16, 16, 4))
    x = stochastic_encode(x0, 25, tables, jax.random.PRNGKey(0))
    a = float(tables.alphas[25])
    assert abs(float(jnp.std(x)) - np.sqrt(1 - a)) < 0.05


def test_freeu_changes_output():
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.utils.dtypes import fp32_policy

    base = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                      attention_resolutions=(1,), num_heads=4, context_dim=64)
    freeu = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                       attention_resolutions=(1,), num_heads=4, context_dim=64,
                       freeu=(0.9, 0.2, 1.2, 1.4))
    pol = fp32_policy()
    m1, m2 = UNetSD15(config=base, policy=pol), UNetSD15(config=freeu, policy=pol)
    x = jnp.ones((1, 16, 16, 4)) * 0.3
    t = jnp.asarray([100])
    ctx = jnp.ones((1, 7, 64)) * 0.1
    params = jax.jit(m1.init)(jax.random.PRNGKey(0), x, t, ctx)
    params["params"]["out_conv"]["kernel"] = (
        jnp.ones_like(params["params"]["out_conv"]["kernel"]) * 0.01
    )
    o1 = m1.apply(params, x, t, ctx)
    o2 = m2.apply(params, x, t, ctx)  # same params, freeu on
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

"""UniPC sampler tests."""

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.ddim import DDIMTables, ddim_sample_loop
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
from prompt_diffusion_tpu.schedulers.unipc import UniPCTables, unipc_sample_loop

SCHED = DiffusionSchedule.create(
    schedule="linear", timesteps=1000, linear_start=0.00085, linear_end=0.0120
)


def test_unipc_exact_for_linear_eps_field():
    """For the exact ε-field of a fixed (x0, ε) ray, the exponential
    integrator is exact at any order/step count: final x = α₀·x0 + σ₀·ε."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    eps_c = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)

    def eps_fn(x, t):
        a = SCHED.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = SCHED.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    tables = UniPCTables.create(SCHED, num_steps=8)
    tT = int(tables.timesteps[0])
    x_T = SCHED.q_sample(x0, jnp.asarray([tT, tT]), eps_c)
    x_final = unipc_sample_loop(eps_fn, x_T, tables)

    a0 = float(SCHED.sqrt_alphas_cumprod[0])
    s0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])
    expected = a0 * x0 + s0 * eps_c
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(expected), atol=5e-4)


def test_unipc_beats_ddim_at_low_step_count():
    """Against a smooth nonlinear ε-field, 8-step UniPC should land closer
    to the 200-step DDIM reference than 8-step DDIM does."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(16, 16)) * 0.3, jnp.float32)

    def eps_fn(x, t):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        tt = (t.astype(jnp.float32) / 1000.0).reshape(-1, 1)
        out = jnp.tanh(flat @ w + tt) @ w.T
        return out.reshape(x.shape)

    x_T = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)

    ref = ddim_sample_loop(eps_fn, x_T, DDIMTables.create(SCHED, 200))
    ddim8 = ddim_sample_loop(eps_fn, x_T, DDIMTables.create(SCHED, 8))
    unipc8 = unipc_sample_loop(eps_fn, x_T, UniPCTables.create(SCHED, 8))

    err_ddim = float(jnp.abs(ddim8 - ref).max())
    err_unipc = float(jnp.abs(unipc8 - ref).max())
    assert err_unipc < err_ddim, (err_unipc, err_ddim)


def test_unipc_order_schedule():
    t = UniPCTables.create(SCHED, num_steps=6)
    assert list(np.asarray(t.pred_order)) == [1, 2, 2, 2, 2, 1]
    assert list(np.asarray(t.corr_order)) == [0, 1, 2, 2, 2, 2]
    assert int(t.timesteps[0]) == 999

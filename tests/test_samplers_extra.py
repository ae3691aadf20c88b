"""PLMS and DPM-Solver++(2M) sampler tests."""

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.ddim import DDIMTables, ddim_sample_loop
from prompt_diffusion_tpu.schedulers.dpm_solver import DPMTables, dpm_solver_pp_2m_loop
from prompt_diffusion_tpu.schedulers.plms import plms_sample_loop
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule

SCHED = DiffusionSchedule.create()


def _linear_field(x0):
    def eps_fn(x, t):
        a = SCHED.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = SCHED.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    return eps_fn


def _nonlinear_field(seed=1):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(16, 16)) * 0.3, jnp.float32)

    def eps_fn(x, t):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        tt = (t.astype(jnp.float32) / 1000.0).reshape(-1, 1)
        return (jnp.tanh(flat @ w + tt) @ w.T).reshape(x.shape)

    return eps_fn


def test_dpm_solver_exact_on_linear_field():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    eps_c = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    tables = DPMTables.create(SCHED, 6)
    tT = int(tables.timesteps[0])
    x_T = SCHED.q_sample(x0, jnp.asarray([tT]), eps_c)
    x = dpm_solver_pp_2m_loop(_linear_field(x0), x_T, tables)
    a0 = float(SCHED.sqrt_alphas_cumprod[0])
    s0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])
    np.testing.assert_allclose(np.asarray(x), np.asarray(a0 * x0 + s0 * eps_c), atol=5e-4)


def test_plms_tracks_ddim_on_linear_field():
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    eps_c = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    tables = DDIMTables.create(SCHED, 10)
    tT = int(tables.timesteps[-1])
    x_T = SCHED.q_sample(x0, jnp.asarray([tT]), eps_c)
    eps_fn = _linear_field(x0)
    out_plms = plms_sample_loop(eps_fn, x_T, tables)
    out_ddim = ddim_sample_loop(eps_fn, x_T, tables)
    # on a linear field multistep extrapolation is benign: both must land
    # at the same endpoint
    np.testing.assert_allclose(np.asarray(out_plms), np.asarray(out_ddim), atol=5e-3)


def test_higher_order_beats_ddim_at_low_steps():
    eps_fn = _nonlinear_field()
    rng = np.random.default_rng(3)
    x_T = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    ref = ddim_sample_loop(eps_fn, x_T, DDIMTables.create(SCHED, 200))
    err_ddim = float(jnp.abs(ddim_sample_loop(eps_fn, x_T, DDIMTables.create(SCHED, 8)) - ref).max())
    err_dpm = float(jnp.abs(dpm_solver_pp_2m_loop(eps_fn, x_T, DPMTables.create(SCHED, 8)) - ref).max())
    err_plms = float(jnp.abs(plms_sample_loop(eps_fn, x_T, DDIMTables.create(SCHED, 8)) - ref).max())
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    assert err_plms < err_ddim * 1.5, (err_plms, err_ddim)

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


def test_pp_2m_fast_path_matches_general_multistep():
    """The fused 2M fast path must agree with the general multistep loop
    at order 2 — including the lower_order_final order-1 drop on the
    final step of short schedules."""
    from prompt_diffusion_tpu.schedulers.dpm_solver import dpm_solver_multistep_loop

    eps_fn = _nonlinear_field()
    rng = np.random.default_rng(11)
    x_T = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    tables = DPMTables.create(SCHED, 8)
    fast = dpm_solver_pp_2m_loop(eps_fn, x_T, tables)
    general = dpm_solver_multistep_loop(
        eps_fn, x_T, tables, order=2, predict_x0=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(general),
                               atol=2e-5, rtol=1e-5)


def test_plms_matches_reference_loop_restatement():
    """Trajectory-EXACT check against a numpy restatement of the
    reference PLMS loop (ldm/models/diffusion/plms.py:164-167,226-244):
    RK first step, then Adams-Bashforth orders 2/3/4 keyed on
    len(old_eps) — catches any off-by-one in the order schedule that the
    tolerance-based tests above cannot."""
    eps_fn = _nonlinear_field()
    rng = np.random.default_rng(7)
    x_T = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    tables = DDIMTables.create(SCHED, 7)
    S = tables.num_steps

    def ddim_xprev(x, e, index):
        a_t = float(tables.alphas[index])
        a_prev = float(tables.alphas_prev[index])
        sq1m = float(tables.sqrt_one_minus_alphas[index])
        pred_x0 = (x - sq1m * e) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev) * e
        return np.sqrt(a_prev) * pred_x0 + dir_xt

    x = np.asarray(x_T, np.float64)
    old_eps = []
    for i in range(S):
        index = S - 1 - i
        t = int(tables.timesteps[index])
        e_t = np.asarray(eps_fn(jnp.asarray(x, jnp.float32),
                                jnp.asarray([t])), np.float64)
        if len(old_eps) == 0:
            x1 = ddim_xprev(x, e_t, index)
            t_next = int(tables.timesteps[max(index - 1, 0)])
            e_next = np.asarray(eps_fn(jnp.asarray(x1, jnp.float32),
                                       jnp.asarray([t_next])), np.float64)
            e_prime = (e_t + e_next) / 2
        elif len(old_eps) == 1:
            e_prime = (3 * e_t - old_eps[-1]) / 2
        elif len(old_eps) == 2:
            e_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old_eps[-1] + 37 * old_eps[-2]
                       - 9 * old_eps[-3]) / 24
        x = ddim_xprev(x, e_prime, index)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)

    ours = np.asarray(plms_sample_loop(eps_fn, x_T, tables), np.float64)
    np.testing.assert_allclose(ours, x, atol=2e-4)


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

"""Flow-matching scheduler tests (SD3 path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.schedulers.flow_match import (
    FlowMatchSchedule,
    flow_match_sample_loop,
    flow_match_step,
    logit_normal_timestep_density,
    make_inference_sigmas,
)


def test_shifted_sigma_endpoints():
    sched = FlowMatchSchedule.create(num_train_timesteps=1000, shift=3.0)
    s = np.asarray(sched.sigmas)
    # σ(t=T)=1 regardless of shift; σ(t=1)=shift/T /(1+(shift-1)/T)
    assert s[0] == pytest.approx(1.0, abs=1e-6)
    raw = 1.0 / 1000
    assert s[-1] == pytest.approx(3 * raw / (1 + 2 * raw), rel=1e-5)
    assert np.all(np.diff(s) < 0)  # strictly decreasing


def test_inference_sigmas_trailing_zero():
    ts, sig = make_inference_sigmas(28, 1000, shift=3.0)
    assert ts.shape == (28,) and sig.shape == (29,)
    assert sig[-1] == 0.0
    assert ts[0] == pytest.approx(1000 * sig[0], rel=1e-6)


def test_euler_integrates_linear_flow_exactly():
    """For the true linear flow v = ε − x0 (constant in σ), Euler is exact:
    starting from x(σ=1)=ε, the loop must land on x0 for any step count."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    v = eps - x0

    x_final = flow_match_sample_loop(
        lambda x, t: v, x_T=eps, num_inference_steps=7, shift=3.0
    )
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(x0), atol=1e-5)


def test_add_noise_matches_definition():
    sched = FlowMatchSchedule.create()
    x0 = jnp.ones((2, 2, 2, 4))
    noise = jnp.zeros_like(x0) + 3.0
    sigma = jnp.asarray([0.25, 0.75])
    out = sched.add_noise(x0, sigma, noise)
    np.testing.assert_allclose(np.asarray(out[0]), 0.75 * 1 + 0.25 * 3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 0.25 * 1 + 0.75 * 3, rtol=1e-6)


def test_logit_normal_density_in_unit_interval():
    u = logit_normal_timestep_density(jax.random.PRNGKey(0), 4096)
    u = np.asarray(u)
    assert np.all((u > 0) & (u < 1))
    assert abs(float(u.mean()) - 0.5) < 0.02  # symmetric around 0.5

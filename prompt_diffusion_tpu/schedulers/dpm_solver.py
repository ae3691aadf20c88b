"""DPM-Solver++(2M) sampler as a pure `lax.scan`.

Re-expression of the reference's DPM-Solver library
(ldm/models/diffusion/dpm_solver/dpm_solver.py, 1,153 LoC; wrapper
sampler.py:13) reduced to the variant that matters in practice:
DPM-Solver++ 2M (multistep, data-prediction, deterministic), in log-SNR
space:

    λ = ln(α/σ),  h_i = λ_i − λ_{i−1}
    D_i = (1 + 1/(2r))·x0_i − 1/(2r)·x0_{i−1},   r = h_{i−1}/h_i
    x_i = (σ_i/σ_{i−1})·x_{i−1} − α_i·(e^{−h_i} − 1)·D_i

First step falls back to first order (D = x0).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class DPMTables:
    timesteps: jnp.ndarray  # (S,) model timesteps, descending
    alpha: jnp.ndarray  # (S+1,): entry i = state after i steps; entry 0 = start
    sigma: jnp.ndarray
    lam: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_steps: int) -> "DPMTables":
        T = schedule.num_timesteps
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        # uniform-in-t grid from T-1 down to 0 (S+1 knots)
        ts = np.linspace(T - 1, 0, num_steps + 1).round().astype(np.int64)
        alpha = np.sqrt(acp[ts])
        sigma = np.sqrt(1.0 - acp[ts])
        lam = np.log(alpha / sigma)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            timesteps=jnp.asarray(ts[:-1], jnp.int32),
            alpha=f32(alpha), sigma=f32(sigma), lam=f32(lam),
        )


def dpm_solver_pp_2m_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    tables: DPMTables,
) -> jnp.ndarray:
    S = tables.num_steps
    b = x_T.shape[0]
    zeros = jnp.zeros_like(x_T)

    def body(carry, i):
        x, x0_prev, has_prev = carry
        t = tables.timesteps[i]
        a_s, s_s, l_s = tables.alpha[i], tables.sigma[i], tables.lam[i]
        a_t, s_t, l_t = tables.alpha[i + 1], tables.sigma[i + 1], tables.lam[i + 1]
        eps = eps_fn(x, jnp.full((b,), t, dtype=jnp.int32))
        x0 = (x - s_s * eps) / a_s

        h = l_t - l_s
        h_prev = l_s - tables.lam[jnp.maximum(i - 1, 0)]
        r = h_prev / h
        D_2m = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev
        D = jnp.where(has_prev, D_2m, x0)
        x_next = (s_t / s_s) * x - a_t * jnp.expm1(-h) * D
        return (x_next, x0, jnp.bool_(True)), None

    (x, *_), _ = jax.lax.scan(body, (x_T, zeros, jnp.bool_(False)), jnp.arange(S))
    return x

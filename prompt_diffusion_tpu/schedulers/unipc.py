"""UniPC (unified predictor-corrector) sampler as a pure `lax.scan`.

The reference samples its diffusers SD1.5 pipeline with
UniPCMultistepScheduler (train_promptdiffusion_sd15.py:90-103, 24-step
batch generation in generate_train.py:108-110). This is that sampler —
solver_order=2, solver_type="bh2", predict_x0, epsilon prediction,
lower_order_final — re-derived as index-parameterized pure updates with
all mutable scheduler state (model-output history, last_sample) carried
through the scan, so the whole loop compiles to one XLA program.

Math follows the UniPC paper (arXiv 2302.04867) in log-SNR (λ) space:
    α_t = sqrt(ᾱ_t), σ_t = sqrt(1−ᾱ_t), λ = ln(α/σ), h = λ_next − λ_cur
    predictor  (order 2): x_next = (σn/σc)x − αn·φ1·m0 − αn·B_h·(½·D1)
    corrector  (order 2): solve R·ρ = b over history differences
with φ1 = expm1(−h), B_h = φ1 (bh2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class UniPCTables:
    """Per-step tables. Arrays length S; *_next holds the target of step i
    (entry S-1 targets DDPM t=0)."""

    timesteps: jnp.ndarray  # (S,) int32 — model eval timestep of step i
    alpha_cur: jnp.ndarray
    sigma_cur: jnp.ndarray
    lambda_cur: jnp.ndarray
    alpha_next: jnp.ndarray
    sigma_next: jnp.ndarray
    lambda_next: jnp.ndarray
    pred_order: jnp.ndarray  # (S,) int32 — predictor order at step i
    corr_order: jnp.ndarray  # (S,) int32 — corrector order at step i (0=skip)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_steps: int, order: int = 2) -> "UniPCTables":
        T = schedule.num_timesteps
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        # diffusers "linspace" spacing: S+1 points 0..T-1, reversed, drop last
        ts = np.linspace(0, T - 1, num_steps + 1).round()[::-1][:-1].astype(np.int64)
        t_next = np.concatenate([ts[1:], [0]])

        def tables(t_idx):
            a = np.sqrt(acp[t_idx])
            s = np.sqrt(1.0 - acp[t_idx])
            return a, s, np.log(a / s)

        a_c, s_c, l_c = tables(ts)
        a_n, s_n, l_n = tables(t_next)
        idx = np.arange(num_steps)
        # warmup (lower_order_nums) + lower_order_final
        pred_order = np.minimum(np.minimum(order, idx + 1), num_steps - idx)
        corr_order = np.concatenate([[0], pred_order[:-1]])  # corrector skipped at i=0
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_cur=f32(a_c), sigma_cur=f32(s_c), lambda_cur=f32(l_c),
            alpha_next=f32(a_n), sigma_next=f32(s_n), lambda_next=f32(l_n),
            pred_order=jnp.asarray(pred_order, jnp.int32),
            corr_order=jnp.asarray(corr_order, jnp.int32),
        )


def _bh2_coeffs(hh):
    phi1 = jnp.expm1(hh)
    phi2 = phi1 / hh - 1.0
    phi3 = phi2 / hh - 0.5
    B_h = phi1  # bh2
    return phi1, phi2, phi3, B_h


def unipc_sample_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    tables: UniPCTables,
) -> jnp.ndarray:
    """Full UniPC-2 (bh2) sampling loop under one `lax.scan`.

    eps_fn(x, t_batch) returns the (CFG-combined) ε-prediction.
    """
    S = tables.num_steps
    b = x_T.shape[0]
    zeros = jnp.zeros_like(x_T)

    def body(carry, i):
        x, x_last, m_prev, m_prevprev, l_prev, l_prevprev = carry
        t = tables.timesteps[i]
        eps = eps_fn(x, jnp.full((b,), t, dtype=jnp.int32))
        a_c, s_c, l_c = tables.alpha_cur[i], tables.sigma_cur[i], tables.lambda_cur[i]
        model_t = (x - s_c * eps) / a_c  # ε → x0 (predict_x0)

        # ---- corrector: re-derive x at t from x_last (at s0=prev step) ----
        def correct():
            h = l_c - l_prev
            hh = -h
            phi1, phi2, phi3, B_h = _bh2_coeffs(hh)
            D1_t = model_t - m_prev
            base = (s_c / _sigma_of_lambda(l_prev)) * x_last
            # order-1 correction: ρ = [0.5] on D1_t
            x_c1 = base - a_c * phi1 * m_prev - a_c * B_h * (0.5 * D1_t)
            # order-2: history point at λ_prevprev
            r1 = (l_prevprev - l_prev) / h
            D1_0 = (m_prevprev - m_prev) / jnp.where(r1 == 0, 1.0, r1)
            b1 = phi2 / B_h
            b2 = phi3 * 2.0 / B_h
            # solve [[1,1],[r1,1]]·ρ = [b1,b2]
            det = 1.0 - r1
            rho0 = (b1 - b2) / jnp.where(det == 0, 1.0, det)
            rho1 = b1 - rho0
            x_c2 = base - a_c * phi1 * m_prev - a_c * B_h * (rho0 * D1_0 + rho1 * D1_t)
            return jnp.where(tables.corr_order[i] >= 2, x_c2, x_c1)

        corrected = correct()
        x = jnp.where(tables.corr_order[i] >= 1, corrected, x)
        # sample at t after correction; model_t unchanged (matches diffusers)

        # ---- predictor: move x from t to t_next ----
        a_n, s_n, l_n = tables.alpha_next[i], tables.sigma_next[i], tables.lambda_next[i]
        h = l_n - l_c
        hh = -h
        phi1, phi2, phi3, B_h = _bh2_coeffs(hh)
        x_p1 = (s_n / s_c) * x - a_n * phi1 * model_t
        r1 = (l_prev - l_c) / h
        D1 = (m_prev - model_t) / jnp.where(r1 == 0, 1.0, r1)
        x_p2 = x_p1 - a_n * B_h * (0.5 * D1)
        x_next = jnp.where(tables.pred_order[i] >= 2, x_p2, x_p1)

        return (x_next, x, model_t, m_prev, l_c, l_prev), None

    init = (x_T, zeros, zeros, zeros, jnp.float32(0.0), jnp.float32(0.0))
    (x, *_), _ = jax.lax.scan(body, init, jnp.arange(S))
    return x


def _sigma_of_lambda(lmbda):
    """σ from λ: σ = 1/sqrt(1+e^{2λ}) (since α²+σ²=1, λ=ln(α/σ))."""
    return jax.lax.rsqrt(1.0 + jnp.exp(2.0 * lmbda))

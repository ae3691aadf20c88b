"""DDIM sampling as pure, scan-able functions.

The reference runs DDIM as a Python loop with a stateful sampler object
(cldm/ddim_hacked.py:122-234). Here the per-step update is a pure function
of (x_t, step-index) and precomputed tables, so the full S-step loop jits
into a single `lax.scan` — one XLA program, no per-step dispatch.

Update rule (ddim_hacked.py:211-234):
    pred_x0 = (x − sqrt(1−α_t)·ε) / sqrt(α_t)
    dir_xt  = sqrt(1 − α_prev − σ²)·ε
    x_prev  = sqrt(α_prev)·pred_x0 + dir_xt + σ·z
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.schedules import (
    DiffusionSchedule,
    make_ddim_tables,
    make_ddim_timesteps,
)


@dataclasses.dataclass(frozen=True)
class DDIMTables:
    """Per-DDIM-step tables, ordered by ascending DDPM timestep.

    Index convention matches the reference: sampling runs index S-1 → 0
    (`ddim_sampling` iterates reversed timesteps with
    index = total − i − 1, ddim_hacked.py:150-151).
    """

    timesteps: jnp.ndarray  # (S,) int32 DDPM timestep fed to the model
    alphas: jnp.ndarray  # (S,) ᾱ at each step
    alphas_prev: jnp.ndarray  # (S,)
    sqrt_one_minus_alphas: jnp.ndarray  # (S,)
    sigmas: jnp.ndarray  # (S,)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: str = "uniform",
    ) -> "DDIMTables":
        acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        ddim_ts = make_ddim_timesteps(num_steps, schedule.num_timesteps, method)
        sigmas, alphas, alphas_prev = make_ddim_tables(acp, ddim_ts, eta)
        f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
        )


def ddim_step(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    index: jnp.ndarray,
    tables: DDIMTables,
    noise: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
):
    """One DDIM update x_t → x_{t-1}. Returns (x_prev, pred_x0).

    `index` is a scalar DDIM step index (same step for the whole batch,
    like the reference sampler); table values broadcast over the batch.
    """
    a_t = tables.alphas[index].astype(x.dtype)
    a_prev = tables.alphas_prev[index].astype(x.dtype)
    sqrt_1m_at = tables.sqrt_one_minus_alphas[index].astype(x.dtype)
    sigma_t = tables.sigmas[index].astype(x.dtype)

    pred_x0 = (x - sqrt_1m_at * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * eps
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if noise is not None:
        x_prev = x_prev + sigma_t * noise * temperature
    return x_prev, pred_x0


def ddim_sample_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    tables: DDIMTables,
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Run the full DDIM loop under one `lax.scan`.

    eps_fn(x, t) must return the ε-prediction (CFG-combined by the caller).
    When eta > 0 a `rng` must be provided for the stochastic term.
    """
    num_steps = tables.num_steps
    stochastic = rng is not None

    def body(carry, i):
        x, key = carry
        index = num_steps - 1 - i
        t = tables.timesteps[index]
        t_b = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = eps_fn(x, t_b)
        if stochastic:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        else:
            noise = None
        x_prev, _ = ddim_step(x, eps, index, tables, noise=noise, temperature=temperature)
        return (x_prev, key), None

    key0 = rng if stochastic else jax.random.PRNGKey(0)
    (x_final, _), _ = jax.lax.scan(body, (x_T, key0), jnp.arange(num_steps))
    return x_final


def ddim_encode_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    tables: DDIMTables,
    t_enc: int,
) -> jnp.ndarray:
    """Deterministic DDIM inversion x_0 → x_{t_enc} (image editing,
    ddim_hacked.py `encode` :236-275): run the update backwards through the
    first `t_enc` DDIM steps."""
    def body(x, i):
        # forward through index i: treat alphas[i] as "next"
        t = tables.timesteps[i]
        t_b = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = eps_fn(x, t_b)
        a_next = tables.alphas[i].astype(x.dtype)
        a_cur = tables.alphas_prev[i].astype(x.dtype)
        x0_pred = (x - jnp.sqrt(1.0 - a_cur) * eps) / jnp.sqrt(a_cur)
        x_next = jnp.sqrt(a_next) * x0_pred + jnp.sqrt(1.0 - a_next) * eps
        return x_next, None

    x, _ = jax.lax.scan(body, x0, jnp.arange(t_enc))
    return x


def stochastic_encode(
    x0: jnp.ndarray, t_index: int, tables: DDIMTables, rng: jax.Array
) -> jnp.ndarray:
    """q_sample using the DDIM α sub-table (ddim_hacked.py
    `stochastic_encode` :277-291)."""
    a = tables.alphas[t_index]
    noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_decode_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_t: jnp.ndarray,
    tables: DDIMTables,
    t_start: int,
) -> jnp.ndarray:
    """Denoise from DDIM index t_start−1 down to 0 (ddim_hacked.py
    `decode` :293-319) — the second half of edit-by-inversion."""
    num = tables.num_steps

    def body(x, i):
        index = t_start - 1 - i
        do = index >= 0
        t = tables.timesteps[jnp.maximum(index, 0)]
        t_b = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = eps_fn(x, t_b)
        x_prev, _ = ddim_step(x, eps, jnp.maximum(index, 0), tables)
        return jnp.where(do, x_prev, x), None

    x, _ = jax.lax.scan(body, x_t, jnp.arange(num))
    return x

"""Flow-matching Euler scheduler (SD3 path).

Mirrors diffusers' FlowMatchEulerDiscreteScheduler as used by the reference
SD3 pipeline/trainer (promptdiffusioncontrolnetpipeline_sd3.py:1138;
train_promptdiffusion_sd3.py:899-902,1168-1221) but as pure tables + a pure
step so the denoise loop is a `lax.scan`.

Definitions (shift-resolved sigmas, default shift=3.0 for SD3):
    σ(t) linear from 1 → 1/T, shifted: σ' = s·σ / (1 + (s−1)·σ)
    timestep   = σ'·T
    noisy x    = (1−σ')·x0 + σ'·ε            (training forward)
    Euler step = x + (σ_next − σ_cur)·v      (v = model output, "velocity")
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Training-time σ table over T=num_train_timesteps levels."""

    sigmas: jnp.ndarray  # (T,) descending from ~1 → 1/T (after shift)
    timesteps: jnp.ndarray  # (T,) = sigmas * T
    num_train_timesteps: int
    shift: float

    @classmethod
    def create(cls, num_train_timesteps: int = 1000, shift: float = 3.0) -> "FlowMatchSchedule":
        ts = np.linspace(1, num_train_timesteps, num_train_timesteps, dtype=np.float64)[::-1]
        sigmas = ts / num_train_timesteps
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        return cls(
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            timesteps=jnp.asarray(sigmas * num_train_timesteps, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            shift=shift,
        )

    def sigma_for_timestep_index(self, idx: jnp.ndarray) -> jnp.ndarray:
        return self.sigmas[idx]

    def add_noise(self, x0: jnp.ndarray, sigma: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """x_σ = (1−σ)·x0 + σ·ε (train_promptdiffusion_sd3.py:1217)."""
        shape = sigma.shape + (1,) * (x0.ndim - sigma.ndim)
        s = sigma.reshape(shape).astype(x0.dtype)
        return (1.0 - s) * x0 + s * noise


def make_inference_sigmas(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    shift: float = 3.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(timesteps, sigmas) for an S-step flow-match Euler run.

    sigmas has length S+1 with a trailing 0 so step i uses
    (sigmas[i] → sigmas[i+1]).
    """
    ts = np.linspace(1.0, num_train_timesteps, num_inference_steps, dtype=np.float64)[::-1]
    sigmas = ts / num_train_timesteps
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return timesteps, sigmas


def flow_match_step(x: jnp.ndarray, v: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
    """Euler: x_{i+1} = x_i + (σ_{i+1} − σ_i)·v."""
    return x + (sigma_next - sigma).astype(x.dtype) * v


def flow_match_sample_loop(
    velocity_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    shift: float = 3.0,
) -> jnp.ndarray:
    """Full flow-match Euler loop as one `lax.scan`."""
    timesteps_np, sigmas_np = make_inference_sigmas(
        num_inference_steps, num_train_timesteps, shift
    )
    timesteps = jnp.asarray(timesteps_np, dtype=jnp.float32)
    sigmas = jnp.asarray(sigmas_np, dtype=jnp.float32)

    def body(x, i):
        t_b = jnp.full((x.shape[0],), timesteps[i], dtype=jnp.float32)
        v = velocity_fn(x, t_b)
        x_next = flow_match_step(x, v, sigmas[i], sigmas[i + 1])
        return x_next, None

    x_final, _ = jax.lax.scan(body, x_T, jnp.arange(num_inference_steps))
    return x_final


def logit_normal_timestep_density(
    rng: jax.Array,
    batch: int,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
) -> jnp.ndarray:
    """Logit-normal u∈(0,1) for training-timestep sampling
    (diffusers compute_density_for_timestep_sampling, used at
    train_promptdiffusion_sd3.py:1207-1215)."""
    u = jax.random.normal(rng, (batch,), dtype=jnp.float32) * logit_std + logit_mean
    return jax.nn.sigmoid(u)

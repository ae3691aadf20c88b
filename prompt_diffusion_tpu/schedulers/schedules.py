"""Noise schedules and diffusion-process tables.

Numerics mirror the reference exactly (same formulas, float64 table
construction) so that imported checkpoints sample identically:
  * beta schedules         — ldm/modules/diffusionmodules/util.py:21-44
  * DDPM buffers           — ldm/models/diffusion/ddpm.py:138-192
  * DDIM timestep/α tables — ldm/modules/diffusionmodules/util.py:46-75

Tables are built host-side in numpy float64 (JAX x64 is off by default;
we only ship the final fp32 arrays to device) and are treated as constants
inside jitted samplers — the whole denoise loop becomes one `lax.scan`
with table gathers, no host sync per step.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule, float64. "linear" is SD's sqrt-space linear ramp."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM process tables (all fp32 jnp arrays, length T).

    Field names follow the standard DDPM buffer naming so the mapping to
    the reference buffers (ddpm.py:158-180) is one-to-one.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            schedule, timesteps, linear_start=linear_start, linear_end=linear_end, cosine_s=cosine_s
        )
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        posterior_variance = (1 - v_posterior) * betas * (1.0 - acp_prev) / (1.0 - acp) + v_posterior * betas
        f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )

    # --- forward process & parameterization changes (ddpm.py:218-377) ---

    def _gather(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        out = table[t]
        return out.reshape(out.shape + (1,) * (ndim - out.ndim))

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε  (ddpm.py:356-361)."""
        nd = x_start.ndim
        return (
            self._gather(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._gather(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def get_v(self, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v-target: v = sqrt(ᾱ)·ε − sqrt(1−ᾱ)·x0  (ddpm.py:377-381)."""
        nd = x.ndim
        return (
            self._gather(self.sqrt_alphas_cumprod, t, nd) * noise
            - self._gather(self.sqrt_one_minus_alphas_cumprod, t, nd) * x
        )

    def predict_start_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            self._gather(self.sqrt_alphas_cumprod, t, nd) * x_t
            - self._gather(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def predict_eps_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            self._gather(self.sqrt_alphas_cumprod, t, nd) * v
            + self._gather(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_t
        )

    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            self._gather(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._gather(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    method: str = "uniform",
) -> np.ndarray:
    """DDIM sub-sequence of DDPM steps (util.py:46-62). Returns int array
    of length S with values in [1, T]; the +1 offset matches the reference."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization: {method}")
    # the reference's +1 offset can index T when S∤T (latent bug there —
    # it only ever uses divisible S); clamp to the last valid timestep.
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_ddim_tables(
    alphas_cumprod: np.ndarray,
    ddim_timesteps: np.ndarray,
    eta: float = 0.0,
):
    """(σ, α, α_prev) per DDIM step (util.py:65-75), float64 in / out."""
    acp = np.asarray(alphas_cumprod, dtype=np.float64)
    alphas = acp[ddim_timesteps]
    alphas_prev = np.asarray([acp[0]] + acp[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev

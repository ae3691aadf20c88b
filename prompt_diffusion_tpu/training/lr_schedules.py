"""LR lambda schedules (optax-native).

Replaces `ldm/lr_scheduler.py`: `LambdaLinearScheduler` (:81-97, used via
models/cldm_v15.yaml:21-28) and the warmup-cosine variants (:4-79).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lambda_linear(
    base_lr: float,
    warm_up_steps: int = 0,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
) -> optax.Schedule:
    """f ramps f_start→f_max over warmup, then decays linearly toward
    f_min over the cycle: f = f_min + (f_max-f_min)·(L-n)/L, exactly
    LambdaLinearScheduler (ldm/lr_scheduler.py:92-97). The PD config's
    single cycle has f_min == f_max and L = 1e13, making the decay a
    constant — but a non-trivial f_min must actually decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        if warm_up_steps > 0:
            warm = f_start + (f_max - f_start) * step / warm_up_steps
            f = jnp.where(step < warm_up_steps, warm, decay)
        else:
            f = decay
        return base_lr * f

    return schedule


def warmup_cosine(
    base_lr: float, warm_up_steps: int, lr_min: float, lr_max: float, lr_start: float, max_steps: int
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / jnp.maximum(warm_up_steps, 1)
        t = (step - warm_up_steps) / jnp.maximum(max_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule

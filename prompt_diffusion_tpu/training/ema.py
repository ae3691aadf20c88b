"""Exponential moving average of parameters.

Replaces `LitEma` (ldm/modules/ema.py:5-80): decay 0.9999 with the same
update-count warmup  decay_t = min(decay, (1+t)/(10+t)),  kept as a pure
pytree update so it fuses into the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    count: jnp.ndarray  # int32 scalar


def ema_init(params) -> EMAState:
    # copy (not alias) so the train step can donate both trees safely
    return EMAState(params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
                    count=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, decay: float = 0.9999) -> EMAState:
    count = state.count + 1
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    upd = jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)), state.params, new_params
    )
    return EMAState(params=upd, count=count)


def ema_update_every(state: EMAState, new_params, decay: float,
                     step, every: int) -> EMAState:
    """LitEma parity under gradient accumulation: the reference updates
    the EMA once per OPTIMIZER step (on_train_batch_end after the
    accumulated step), and with optax.MultiSteps the params only change
    every `every` micro-steps — so the decay/warmup count must only
    advance then, not every micro-step."""
    if every <= 1:
        return ema_update(state, new_params, decay)
    new = ema_update(state, new_params, decay)
    apply = (step + 1) % every == 0
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(apply, n, o), new, state)

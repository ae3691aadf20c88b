"""PLMS (pseudo linear multistep) sampler as a pure `lax.scan`.

Re-expression of `ldm/models/diffusion/plms.py` (PLMSSampler :12, available
in the reference's sampler library): Adams-Bashforth multistep over the
DDIM update —
    e' = e_t                                (first step: plus a 2nd-order
                                             corrector using x_{t-1})
    e' = (3e_t − e_{t−1})/2                 (2 history)
    e' = (23e_t − 16e_{t−1} + 5e_{t−2})/12  (3 history)
    e' = (55e_t − 59e_{t−1} + 37e_{t−2} − 9e_{t−3})/24
then the deterministic DDIM x-update with e'.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.schedulers.ddim import DDIMTables, ddim_step


def plms_sample_loop(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    tables: DDIMTables,
) -> jnp.ndarray:
    """Full PLMS loop (eta is 0 by construction)."""
    S = tables.num_steps
    b = x_T.shape[0]
    zeros = jnp.zeros_like(x_T)

    def combine(e_t, hist, n_hist):
        e1, e2, e3 = hist
        return jnp.select(
            [n_hist == 0, n_hist == 1, n_hist == 2],
            [
                e_t,
                (3 * e_t - e1) / 2,
                (23 * e_t - 16 * e1 + 5 * e2) / 12,
            ],
            (55 * e_t - 59 * e1 + 37 * e2 - 9 * e3) / 24,
        )

    def body(carry, i):
        x, e1, e2, e3, n_hist = carry
        index = S - 1 - i
        t = tables.timesteps[index]
        t_b = jnp.full((b,), t, dtype=jnp.int32)
        e_t = eps_fn(x, t_b)

        # first step uses a Runge-Kutta-style corrector (plms.py p_sample_plms):
        # x' from e_t, then e at (x', t_next), averaged.
        def first_step(_):
            x_prev_1, _ = ddim_step(x, e_t, index, tables)
            idx_next = jnp.maximum(index - 1, 0)
            t_next = tables.timesteps[idx_next]
            e_t_next = eps_fn(x_prev_1, jnp.full((b,), t_next, dtype=jnp.int32))
            return (e_t + e_t_next) / 2

        def multistep(_):
            # n_hist == len(old_eps): 1 history ε → 2nd-order AB
            # (plms.py:232-234) — NOT n_hist-1, which would run every
            # step one order lower than the reference
            return combine(e_t, (e1, e2, e3), n_hist)

        e_prime = jax.lax.cond(n_hist == 0, first_step, multistep, None)
        x_prev, _ = ddim_step(x, e_prime, index, tables)
        return (x_prev, e_t, e1, e2, jnp.minimum(n_hist + 1, 4)), None

    init = (x_T, zeros, zeros, zeros, jnp.int32(0))
    (x, *_), _ = jax.lax.scan(body, init, jnp.arange(S))
    return x

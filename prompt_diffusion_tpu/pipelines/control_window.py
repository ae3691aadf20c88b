"""Per-step ControlNet guidance windowing (`control_guidance_start/end`).

The reference pipelines precompute a python list `controlnet_keep` of
per-step 0/1 factors and multiply it into `conditioning_scale` each loop
iteration (pipeline_prompt_diffusion.py:1195-1235,
promptdiffusioncontrolnetpipeline_sd3.py:1156-1162,1202-1208):

    keep_i = 1.0 - float(i / N < start  or  (i + 1) / N > end)

Here the same factor is computed *inside* the jitted denoise loop from the
(possibly traced) step index — start/end stay traced scalars, so changing
the window never recompiles, exactly like guidance_scale/control_scale.
"""

from __future__ import annotations

import jax.numpy as jnp


def control_keep(step_index, num_steps: int, start, end):
    """keep factor for sampling step `step_index` of `num_steps`.

    Reproduces the reference's `controlnet_keep[i]` exactly:
    1 when the step's [i/N, (i+1)/N) fraction window lies inside
    [start, end], else 0. `step_index`, `start`, `end` may be traced;
    `num_steps` is the static table length (the reference's
    `len(timesteps)`).
    """
    i = jnp.asarray(step_index, jnp.float32)
    n = float(num_steps)
    drop = (i / n < start) | ((i + 1.0) / n > end)
    return 1.0 - drop.astype(jnp.float32)


def step_index_from_timestep(table_timesteps: jnp.ndarray, t):
    """Sampling-order step index of model timestep `t`.

    Diffusion sampling visits timesteps in descending order, so the index
    the reference's `enumerate(timesteps)` would assign equals the number
    of table entries with a larger timestep — regardless of whether the
    table itself is stored ascending (DDIM/PLMS tables) or descending
    (UniPC/DPM tables).
    """
    return jnp.sum((table_timesteps > t).astype(jnp.int32))


def is_default_window(start, end) -> bool:
    """Static (trace-time) check: True when the window provably keeps every
    step, so the pipeline can skip the per-step keep math entirely. Traced
    values are conservatively treated as windowed (the keep math then folds
    them as traced scalars — no recompile on change)."""
    return (
        isinstance(start, (int, float))
        and isinstance(end, (int, float))
        and float(start) == 0.0
        and float(end) == 1.0
    )


def validate_window(start, end) -> None:
    """Trace-time validation for python-float windows — same constraints the
    reference's check_inputs enforces (pipeline_prompt_diffusion.py:609-621).
    Traced values skip validation (data-dependent checks can't run under
    jit), matching how the reference only validates host-side scalars."""
    s_static = isinstance(start, (int, float))
    e_static = isinstance(end, (int, float))
    if s_static and e_static and float(start) >= float(end):
        raise ValueError(
            f"control_guidance_start ({start}) cannot be larger or equal to "
            f"control_guidance_end ({end})"
        )
    if s_static and not 0.0 <= float(start) <= 1.0:
        raise ValueError(f"control_guidance_start ({start}) must be in [0, 1]")
    if e_static and not 0.0 <= float(end) <= 1.0:
        raise ValueError(f"control_guidance_end ({end}) must be in [0, 1]")

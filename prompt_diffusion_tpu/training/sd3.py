"""SD3 Prompt-Diffusion (flow-matching ControlNet) training step.

Pure jitted re-expression of `train_promptdiffusion_sd3.py:1180-1317`:
  * VAE-encode target with shift+scale                     (:1199-1201)
  * logit-normal timestep sampling → σ lookup              (:1207-1216)
  * noisy = (1−σ)·z + σ·ε                                   (:1217)
  * query cond → VAE latent; support pair → down_proj+VAE   (:1240-1257)
  * ControlNet block residuals → transformer                (:1260-1279)
  * optional EDM preconditioning, σ-weighted FM loss        (:1284-1309)

Trains the ControlNet + down_proj; transformer/VAE/text encoders frozen
(find_unused_parameters DDP in the reference → simply not in `trainable`
here). Text embeddings may be precomputed (the reference precomputes and
frees the encoders, :1058-1080) — pass them in the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3
from prompt_diffusion_tpu.schedulers.flow_match import (
    FlowMatchSchedule,
    logit_normal_timestep_density,
)
from prompt_diffusion_tpu.training.ema import (EMAState, ema_init, ema_update,
                                                ema_update_every)


class SD3TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any  # {"controlnet", "down_proj"}
    opt_state: Any
    ema: Optional[EMAState]


@dataclasses.dataclass(frozen=True)
class SD3TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0
    logit_mean: float = 0.0
    logit_std: float = 1.0
    weighting_scheme: str = "logit_normal"  # sampling density; loss weight ↓
    precondition_outputs: bool = False
    use_ema: bool = False
    ema_decay: float = 0.9999
    accum_steps: int = 1
    shift: float = 3.0


def make_sd3_optimizer(cfg: SD3TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def init_sd3_train_state(cfg: SD3TrainConfig, params, tx) -> SD3TrainState:
    trainable = {"controlnet": params["controlnet"], "down_proj": params["down_proj"]}
    return SD3TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
        ema=ema_init(trainable) if cfg.use_ema else None,
    )


def make_sd3_train_step(pipe: PromptDiffusionSD3, cfg: SD3TrainConfig, tx, mesh=None):
    """step(state, frozen, batch, rng) → (state, metrics).

    batch (NHWC, pixels in [-1,1]):
      image        (B,H,W,3) target image
      control      (B,H,W,3) query condition
      support_cond (B,H,W,3) support condition
      support_image(B,H,W,3) support image
      context      (B,L,joint_dim) precomputed joint text embedding
      pooled       (B,pooled_dim) precomputed pooled embedding

    With `mesh`, params are ZeRO-gathered at step entry (see
    parallel.mesh.make_param_gather).
    """
    from prompt_diffusion_tpu.parallel.mesh import make_param_gather

    gather = make_param_gather(mesh)
    sched = FlowMatchSchedule.create(shift=cfg.shift)
    T = sched.num_train_timesteps

    def loss_fn(trainable, frozen, batch, rng):
        params = {**gather(frozen), **gather(trainable)}
        r_enc, r_t, r_noise, r_cond, r_pair = jax.random.split(rng, 5)

        z = pipe._encode_vae(params, batch["image"], r_enc)
        b = z.shape[0]

        u = logit_normal_timestep_density(r_t, b, cfg.logit_mean, cfg.logit_std)
        idx = jnp.clip((u * T).astype(jnp.int32), 0, T - 1)
        sigmas = sched.sigmas[idx]
        timesteps = sched.timesteps[idx]

        noise = jax.random.normal(r_noise, z.shape, dtype=z.dtype)
        noisy = sched.add_noise(z, sigmas, noise)

        cond_lat = pipe._encode_vae(params, batch["control"], r_cond)
        pair_lat = pipe.encode_support_pair(
            params, batch["support_cond"], batch["support_image"], r_pair
        )

        control = pipe.controlnet.apply(
            params["controlnet"], noisy, timesteps, cond_lat, pair_lat,
            batch["context"], batch["pooled"],
        )
        pred = pipe.transformer.apply(
            params["transformer"], noisy, timesteps, batch["context"], batch["pooled"],
            block_controlnet_hidden_states=control,
        )

        s = sigmas.reshape(b, 1, 1, 1)
        if cfg.precondition_outputs:
            pred = pred * (-s) + noisy
            target = z
            weighting = 1.0 / jnp.maximum(s**2, 1e-8) if cfg.weighting_scheme == "sigma_sqrt" else 1.0
        else:
            target = noise - z
            weighting = 1.0 / jnp.maximum(s**2, 1e-8) if cfg.weighting_scheme == "sigma_sqrt" else 1.0
        # "logit_normal"/"uniform" weighting is uniform at loss time — the
        # density shaping happened in the timestep sampling (diffusers
        # compute_loss_weighting_for_sd3 semantics).
        if cfg.weighting_scheme != "sigma_sqrt":
            weighting = 1.0

        loss = jnp.mean(
            weighting * (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        )
        return loss

    def train_step(state: SD3TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.trainable, frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        ema = (ema_update_every(state.ema, trainable, cfg.ema_decay,
                                state.step, cfg.accum_steps)
               if state.ema is not None else None)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), "step": state.step}
        return SD3TrainState(state.step + 1, trainable, opt_state, ema), metrics

    return train_step

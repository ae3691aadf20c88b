"""SD1.5 Prompt-Diffusion (ControlNet) training step.

Re-expresses the reference training semantics as ONE pure jitted function:
  * VAE-encode + ×0.18215 scaling            (ddpm.py:767-817,655-662)
  * CFG conditioning dropout 5%/5%/5%        (cldm/cldm.py:338-367)
  * q_sample noise injection                 (ddpm.py:356-361)
  * ControlNet → UNet w/ control residuals   (cldm/cldm.py:369-382)
  * ε- or v-target MSE (logvar weighting is a no-op in the PD config:
    logvar_init=0, learn_logvar=False, elbo_weight=0 → plain MSE,
    ddpm.py:885-920)
  * AdamW on the ControlNet only; `sd_locked=False` additionally trains
    the UNet decoder + head                   (cldm/cldm.py:457-464)
  * EMA update (ldm/modules/ema.py)

Parallelism: the step is shape-polymorphic over a (data, fsdp) mesh —
annotate the batch with `batch_sharding(mesh)` and params with
`shard_params(...)`; GSPMD inserts the gradient psum / FSDP collectives.
Gradient accumulation: wrap the optimizer in `optax.MultiSteps`
(reference: accumulate_grad_batches=4, train.py:259).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
from prompt_diffusion_tpu.training.ema import (EMAState, ema_init, ema_update,
                                                ema_update_every)


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any  # {"controlnet": ..., ["unet": ...]}
    opt_state: Any
    ema: Optional[EMAState]


@dataclasses.dataclass(frozen=True)
class SD15TrainConfig:
    learning_rate: float = 1e-4
    drop_rate: float = 0.05
    parameterization: str = "eps"  # or "v"
    sd_locked: bool = True
    use_ema: bool = False
    ema_decay: float = 0.9999
    accum_steps: int = 1
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0  # diffusers trainer clips at 1.0 (:1116-1118)
    # LambdaLinear warmup (ldm/lr_scheduler.py:81-97 via models/cldm_v15.yaml:21-28:
    # warm_up_steps [10000], f_start 1e-6, f_max 1.0, f_min 1.0)
    warm_up_steps: int = 10_000
    lr_f_start: float = 1e-6
    lr_f_max: float = 1.0
    lr_f_min: float = 1.0


def _unet_decoder_mask(unet_params):
    """Mask selecting output_blocks_* + out head (cldm/cldm.py:459-461)."""

    def mask_path(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        top = names[1] if len(names) > 1 else ""
        return top.startswith("output_blocks_") or top in ("out_norm", "out_conv")

    return jax.tree_util.tree_map_with_path(mask_path, unet_params)


def lr_schedule(cfg: SD15TrainConfig) -> optax.Schedule:
    """The reference's LambdaLinear warmup (unity after warmup in the PD
    config since f_min == f_max == 1)."""
    from prompt_diffusion_tpu.training.lr_schedules import lambda_linear

    return lambda_linear(
        cfg.learning_rate,
        warm_up_steps=cfg.warm_up_steps,
        f_start=cfg.lr_f_start,
        f_max=cfg.lr_f_max,
        f_min=cfg.lr_f_min,
    )


def make_optimizer(cfg: SD15TrainConfig, trainable_template) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(lr_schedule(cfg), weight_decay=cfg.weight_decay),
    )
    if not cfg.sd_locked and "unet" in trainable_template:
        mask = {
            "controlnet": jax.tree_util.tree_map(lambda _: True, trainable_template["controlnet"]),
            "unet": _unet_decoder_mask(trainable_template["unet"]),
        }
        # optax.masked passes the RAW gradient through for mask-False
        # leaves (it does not zero them) — the frozen UNet encoder must
        # get an explicit zero update, matching the reference where those
        # params are simply absent from the optimizer (cldm.py:459-461).
        neg = jax.tree_util.tree_map(lambda b: not b, mask)
        tx = optax.chain(optax.masked(tx, mask),
                         optax.masked(optax.set_to_zero(), neg))
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def init_train_state(
    cfg: SD15TrainConfig, pipe_params, tx: optax.GradientTransformation
) -> TrainState:
    trainable = {"controlnet": pipe_params["controlnet"]}
    if not cfg.sd_locked:
        trainable["unet"] = pipe_params["unet"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
        ema=ema_init(trainable) if cfg.use_ema else None,
    )


def make_train_step(pipe: PromptDiffusionSD15, cfg: SD15TrainConfig, tx, mesh=None):
    """Returns step(state, frozen, batch, rng) → (state, metrics).

    batch dict (all NHWC — ranges follow the REFERENCE trainers,
    edit_dataset.py:54-63 / laion_meta_dataset.py:57-63: images are
    Normalize(0.5,0.5) → [-1,1], conditions are ToTensor-only → [0,1]):
      image        (B,H,W,3) target image, [-1,1]
      query        (B,H,W,3) query condition, [0,1]
      example_pair (B,H,W,6) condition[0,1] ‖ image[-1,1] support pair
      token_ids    (B,77) int32 prompt ids
      null_ids     (1,77) int32 ids of the empty prompt (uncond)
    generate.py consumes checkpoints with the same convention; the
    reference NOTEBOOK feeds [-1,1] conditions (its own train/inference
    inconsistency) — examples/run_prompt_diffusion.py mirrors that for
    published-checkpoint compatibility.

    With `mesh`, params are gathered to replicated at step entry (ZeRO
    style: fsdp-sharded at rest, all-gathered for compute). The gather's
    VJP is a reduce-scatter, so gradients come out fsdp-sharded to match
    the optimizer state — and batch-sharded activations never collide
    with fsdp-sharded weights inside the model (which otherwise triggers
    XLA's "involuntary full rematerialization" resharding).
    """
    sched = pipe.schedule
    T = sched.num_timesteps
    d = cfg.drop_rate

    from prompt_diffusion_tpu.parallel.mesh import make_param_gather

    gather = make_param_gather(mesh)

    def loss_fn(trainable, frozen, batch, rng):
        trainable = gather(trainable)
        frozen = gather(frozen)
        unet_params = trainable.get("unet", frozen["unet"])
        params = {
            "unet": unet_params,
            "controlnet": trainable["controlnet"],
            "vae": frozen["vae"],
            "clip": frozen["clip"],
        }
        r_enc, r_t, r_noise, r_drop = jax.random.split(rng, 4)

        z = pipe.encode_image(params, batch["image"], r_enc)
        b = z.shape[0]
        t = jax.random.randint(r_t, (b,), 0, T)
        noise = jax.random.normal(r_noise, z.shape, dtype=z.dtype)
        x_t = sched.q_sample(z, t, noise)

        ctx = pipe.encode_prompt(params, batch["token_ids"])
        null_ctx = pipe.encode_prompt(params, batch["null_ids"])

        # CFG dropout masks (cldm/cldm.py:354-365): r<2d drops text,
        # d≤r<3d zeroes the example pair (overlap [d,2d) drops both).
        r = jax.random.uniform(r_drop, (b,))
        text_mask = (r < 2 * d)[:, None, None]
        ctx = jnp.where(text_mask, null_ctx.astype(ctx.dtype), ctx)
        pair_keep = 1.0 - ((r >= d) & (r < 3 * d)).astype(batch["example_pair"].dtype)
        pair = batch["example_pair"] * pair_keep[:, None, None, None]

        control = pipe.controlnet.apply(
            params["controlnet"], x_t, t, pair, batch["query"], ctx
        )
        pred = pipe.unet.apply(params["unet"], x_t, t, ctx, control=control)

        if cfg.parameterization == "v":
            target = sched.get_v(z, noise, t)
        else:
            target = noise
        loss = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        return loss

    def train_step(state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.trainable, frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        ema = (ema_update_every(state.ema, trainable, cfg.ema_decay,
                                state.step, cfg.accum_steps)
               if state.ema is not None else None)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            # MultiSteps advances the inner schedule once per accum_steps
            # micro-steps — report the LR actually applied
            "lr": lr_schedule(cfg)(state.step // cfg.accum_steps),
            "step": state.step,
        }
        return TrainState(state.step + 1, trainable, opt_state, ema), metrics

    return train_step

"""SD1.5 Prompt-Diffusion ControlNet trainer (TPU).

CLI equivalent of the reference `train.py` (PyTorch-Lightning) and
`train_promptdiffusion_sd15.py` (Accelerate), collapsed into one driver:
data-parallel (+ optional FSDP) over a jax Mesh, orbax checkpointing with
resume, CFG-dropout conditioning, EMA, image/metric logging.

Reference recipe (train.py:204,259-260; README.md:74): lr 1e-4, batch 64,
grad-accum 4, 10k steps, ControlNet-only (sd_locked).

Usage:
  python train_sd15.py --data-root /data/laion --logdir ./logs/run1 \
      --batch-size 8 --max-steps 10000 [--init-ckpt sd15.ckpt] [--resume]

Multi-host: run once per host after `jax.distributed.initialize()` is
handled automatically by jax on TPU pods.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--logdir", default="./logs/run")
    p.add_argument("--tasks", nargs="+", default=["canny", "depth", "hed", "normal"])
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8, help="global batch size")
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--accum-steps", type=int, default=4)
    p.add_argument("--sd-locked", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--parameterization", choices=["eps", "v"], default="eps")
    p.add_argument("--init-ckpt", default=None,
                   help="reference .ckpt/.safetensors to import (tool_add_control applied)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--ckpt-keep", type=int, default=None)
    p.add_argument("--image-log-every", type=int, default=500)
    p.add_argument("--num-fsdp", type=int, default=1)
    p.add_argument("--tokenizer-assets", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="debug: tiny model configs (CPU-runnable smoke)")
    return p.parse_args(argv)


def build_pipe(tiny: bool):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15

    if not tiny:
        return PromptDiffusionSD15.create()
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule

    ucfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                      attention_resolutions=(1,), num_heads=4, context_dim=64)
    return PromptDiffusionSD15(
        unet=UNetSD15(config=ucfg),
        controlnet=ControlNetSD15(config=ucfg),
        vae=AutoencoderKL(config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)),
        text_encoder=CLIPTextModel(
            config=CLIPTextConfig(hidden_size=64, num_layers=2, num_heads=4,
                                  intermediate_size=128)),
        schedule=DiffusionSchedule.create(),
    )


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.data.edit_dataset import BatchLoader, EditDataset
    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer
    from prompt_diffusion_tpu.parallel.mesh import (
        apply_sharding, batch_sharding, make_mesh, shard_params)
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.training import checkpoint as ckpt
    from prompt_diffusion_tpu.training.image_logger import ImageLogger, MetricLogger
    from prompt_diffusion_tpu.training.sd15 import (
        SD15TrainConfig, init_train_state, make_optimizer, make_train_step)

    mesh = make_mesh(num_fsdp=args.num_fsdp)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    pipe = build_pipe(args.tiny)
    total_dp = dict(mesh.shape)["data"] * dict(mesh.shape)["fsdp"]
    if args.batch_size % total_dp:
        raise ValueError(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"mesh's {total_dp} data-parallel devices")
    rng = jax.random.PRNGKey(args.seed)

    if args.init_ckpt:
        from prompt_diffusion_tpu.tools.torch_import import (
            controlnet_init_from_unet, import_ldm_checkpoint)

        params = import_ldm_checkpoint(args.init_ckpt)
        fresh = jax.jit(lambda r: pipe.init_params(r, image_size=args.resolution))(rng)
        if not params["controlnet"]["params"]:
            # SD-only ckpt: clone UNet encoder into ControlNet (tool_add_control)
            params["controlnet"] = controlnet_init_from_unet(
                params["unet"], fresh["controlnet"])
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = jax.jit(lambda r: pipe.init_params(r, image_size=args.resolution))(rng)

    cfg = SD15TrainConfig(
        learning_rate=args.lr, sd_locked=args.sd_locked, use_ema=args.use_ema,
        accum_steps=args.accum_steps, parameterization=args.parameterization,
    )
    trainable_template = {"controlnet": params["controlnet"]}
    if not cfg.sd_locked:
        trainable_template["unet"] = params["unet"]
    tx = make_optimizer(cfg, trainable_template)
    state = init_train_state(cfg, params, tx)
    frozen = {k: params[k] for k in ("unet", "vae", "clip")}

    # shard: params/opt/ema over fsdp (TrainState is a pytree), batch over
    # (data×fsdp); GSPMD inserts the DP grad-psum + FSDP collectives
    state = apply_sharding(state, shard_params(state, mesh))
    frozen = apply_sharding(frozen, shard_params(frozen, mesh))

    manager = ckpt.make_manager(f"{args.logdir}/checkpoints",
                                save_every=args.ckpt_every, keep=args.ckpt_keep)
    start_step = 0
    if args.resume:
        state, restored = ckpt.restore_state(manager, state)
        if restored is not None:
            # checkpoints store the POST-update state of loop step N
            # (state.step == N+1): resume at N+1, not N — re-running N
            # applied its update twice and desynced state.step forever
            start_step = int(restored) + 1
            print(f"resumed from step {start_step}")

    tokenizer = load_tokenizer(args.tokenizer_assets)
    dataset = EditDataset(args.data_root, task_list=args.tasks,
                          resolution=args.resolution)
    loader = BatchLoader(
        dataset, batch_size=args.batch_size, seed=args.seed, tokenizer=tokenizer,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )

    step_fn = jax.jit(make_train_step(pipe, cfg, tx, mesh=mesh), donate_argnums=(0,))
    imlog = ImageLogger(args.logdir, freq=args.image_log_every)
    mlog = MetricLogger(args.logdir)
    bsh = batch_sharding(mesh)

    step_rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    it = iter(loader)
    for step in range(start_step, args.max_steps):
        batch = next(it)
        dev_batch = {
            k: jax.device_put(jnp.asarray(v), bsh)
            for k, v in batch.items() if k in ("image", "query", "example_pair", "token_ids")
        }
        dev_batch["null_ids"] = jnp.asarray(batch["null_ids"])
        state, metrics = step_fn(state, frozen, dev_batch, step_rng)

        if step % 50 == 0:
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            print(f"step {step} loss {loss:.4f} ({dt:.2f}s/50 steps)")
            mlog.log(step, metrics)
        ckpt.save_state(manager, step, state)  # gated by save_interval_steps
        if args.image_log_every > 0 and step % args.image_log_every == 0:
            sample_params = {**frozen, "controlnet": state.trainable["controlnet"]}
            if "unet" in state.trainable:
                sample_params["unet"] = state.trainable["unet"]
            imlog.maybe_log(pipe, sample_params, batch, step, jax.random.PRNGKey(0))

    ckpt.save_final(manager, args.max_steps - 1, state)
    print("done")


if __name__ == "__main__":
    main()

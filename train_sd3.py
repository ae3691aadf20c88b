"""SD3 Prompt-Diffusion flow-matching ControlNet trainer (TPU).

CLI equivalent of the reference `train_promptdiffusion_sd3.py` (Accelerate):
logit-normal timestep sampling, σ-weighted flow-matching MSE, ControlNet +
down_proj trainable, transformer/VAE/text encoders frozen. Text embeddings
are precomputed per batch and the encoders never enter the train step
(reference precomputes + frees them, :1058-1080).

  python train_sd3.py --data-root /data/laion --logdir logs/sd3 [--tiny]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--logdir", default="./logs/sd3")
    p.add_argument("--tasks", nargs="+", default=["canny", "depth", "hed", "normal"])
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--weighting-scheme", default="logit_normal",
                   choices=["logit_normal", "uniform", "sigma_sqrt"])
    p.add_argument("--precondition-outputs", action="store_true")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--ckpt-keep", type=int, default=3)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-fsdp", type=int, default=1)
    p.add_argument("--tokenizer-assets", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def build_pipe(tiny: bool):
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3

    if not tiny:
        return PromptDiffusionSD3.create()
    from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4, num_layers=2,
                      attention_head_dim=16, num_attention_heads=4,
                      joint_attention_dim=64, caption_projection_dim=64,
                      pooled_projection_dim=64, out_channels=4, pos_embed_max_size=16)
    clip = lambda: CLIPTextModel(config=CLIPTextConfig(
        vocab_size=49408, hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64))
    return PromptDiffusionSD3(
        transformer=SD3Transformer(config=cfg),
        controlnet=SD3ControlNet(config=cfg),
        down_proj=SupportPairDownProj(),
        vae=AutoencoderKL(config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                                           z_channels=4, scale_factor=1.5305,
                                           shift_factor=0.0609)),
        clip_l=clip(), clip_g=clip(), t5=None,
    )


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.data.edit_dataset import BatchLoader, EditDataset
    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer
    from prompt_diffusion_tpu.parallel.mesh import (
        apply_sharding, batch_sharding, make_mesh, shard_params)
    from prompt_diffusion_tpu.training import checkpoint as ckpt
    from prompt_diffusion_tpu.training.image_logger import MetricLogger
    from prompt_diffusion_tpu.training.sd3 import (
        SD3TrainConfig, init_sd3_train_state, make_sd3_optimizer, make_sd3_train_step)

    mesh = make_mesh(num_fsdp=args.num_fsdp)
    pipe = build_pipe(args.tiny)
    total_dp = dict(mesh.shape)["data"] * dict(mesh.shape)["fsdp"]
    if args.batch_size % total_dp:
        raise ValueError(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"mesh's {total_dp} data-parallel devices")
    rng = jax.random.PRNGKey(args.seed)

    # init params (full-size from-pretrained import lands via tools/)
    res = args.resolution
    r = jax.random.split(rng, 6)
    zc = pipe.vae.config.z_channels
    lat = jnp.zeros((1, res // 8, res // 8, zc))
    t = jnp.zeros((1,))
    jd = pipe.transformer.config.joint_attention_dim
    pd = pipe.transformer.config.pooled_projection_dim
    ctx = jnp.zeros((1, 10, jd))
    pooled = jnp.zeros((1, pd))
    img = jnp.zeros((1, res, res, 3))
    ids = jnp.zeros((1, 77), jnp.int32)
    params = {
        "transformer": jax.jit(pipe.transformer.init)(r[0], lat, t, ctx, pooled),
        "controlnet": jax.jit(pipe.controlnet.init)(r[1], lat, t, lat, lat, ctx, pooled),
        "down_proj": jax.jit(pipe.down_proj.init)(r[2], img, img),
        "vae": jax.jit(pipe.vae.init)(r[3], img),
        "clip_l": jax.jit(pipe.clip_l.init)(r[4], ids),
        "clip_g": jax.jit(pipe.clip_g.init)(r[5], ids),
    }

    cfg = SD3TrainConfig(learning_rate=args.lr, use_ema=args.use_ema,
                         accum_steps=args.accum_steps,
                         weighting_scheme=args.weighting_scheme,
                         precondition_outputs=args.precondition_outputs)
    tx = make_sd3_optimizer(cfg)
    state = init_sd3_train_state(cfg, params, tx)
    frozen = {k: params[k] for k in ("transformer", "vae", "clip_l", "clip_g")}
    state = apply_sharding(state, shard_params(state, mesh))
    frozen = apply_sharding(frozen, shard_params(frozen, mesh))
    # drop the replicated init-time tree: keeping it alive would hold a
    # second, unsharded copy of the full model in HBM for the whole run
    # (text encoding below uses the fsdp-sharded `frozen` copy)
    del params

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

    tokenizer = load_tokenizer(args.tokenizer_assets)
    dataset = EditDataset(args.data_root, task_list=args.tasks, resolution=res)
    loader = BatchLoader(dataset, batch_size=args.batch_size, seed=args.seed,
                         tokenizer=tokenizer, shard_id=jax.process_index(),
                         num_shards=jax.process_count())

    encode_text = jax.jit(lambda p, ids: pipe.encode_prompt(p, ids, ids))
    step_fn = jax.jit(make_sd3_train_step(pipe, cfg, tx, mesh=mesh), donate_argnums=(0,))
    mlog = MetricLogger(args.logdir)
    bsh = batch_sharding(mesh)
    step_rng = jax.random.PRNGKey(args.seed + 1)

    it = iter(loader)
    t0 = time.perf_counter()
    for step in range(start_step, args.max_steps):
        hb = next(it)
        ids = jnp.asarray(hb["token_ids"])
        context, pooled = encode_text(frozen, ids)
        # loader conditions are [0,1] (edit_dataset semantics) — remap to
        # [-1,1] for the VAE. Deliberate divergence, recorded: the
        # reference SD3 trainer VAE-encodes the raw [0,1] conditions
        # (train_promptdiffusion_sd3.py:1241-1251) while its inference
        # pipeline normalizes them to [-1,1] (VaeImageProcessor default,
        # promptdiffusioncontrolnetpipeline_sd3.py:227) — we match the
        # inference convention on BOTH sides so train and generate agree.
        dev = {
            "image": hb["image"],
            "control": hb["query"] * 2 - 1,
            "support_cond": hb["example_pair"][..., :3] * 2 - 1,
            "support_image": hb["example_pair"][..., 3:],
            "context": np.asarray(context),
            "pooled": np.asarray(pooled),
        }
        dev = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in dev.items()}
        state, metrics = step_fn(state, frozen, dev, step_rng)
        if step % 50 == 0:
            print(f"step {step} loss {float(metrics['loss']):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)")
            t0 = time.perf_counter()
            mlog.log(step, metrics)
        ckpt.save_state(manager, step, state)
    ckpt.save_final(manager, args.max_steps - 1, state)
    print("done")


if __name__ == "__main__":
    main()

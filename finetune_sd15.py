"""Few-shot finetune on a NEW task (finetune_promptdiffusion_sd15.py port).

Same training semantics as train_sd15.py, but data comes from the
meta-dataset's tuning loader: supports drawn from a FIXED small index set
(num_supports=15, shots=1 — finetune_promptdiffusion_sd15.py:739-753),
so the model adapts to one unseen task from a handful of examples.

  python finetune_sd15.py --data-root /data/laion --task mlsd \
      --init-ckpt trained.ckpt --num-supports 15 --max-steps 400
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--task", required=True, help="the new task's condition dir name")
    p.add_argument("--kind", choices=["human", "nonhuman"], default="nonhuman")
    p.add_argument("--logdir", default="./logs/finetune")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=400)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--num-supports", type=int, default=15)
    p.add_argument("--init-ckpt", default=None)
    p.add_argument("--ckpt-every", type=int, default=100)
    p.add_argument("--tokenizer-assets", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from prompt_diffusion_tpu.data.laion_meta import ControlDataModule
    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer
    from prompt_diffusion_tpu.parallel.mesh import apply_sharding, batch_sharding, make_mesh, shard_params
    from prompt_diffusion_tpu.training import checkpoint as ckpt
    from prompt_diffusion_tpu.training.image_logger import MetricLogger
    from prompt_diffusion_tpu.training.sd15 import (
        SD15TrainConfig, init_train_state, make_optimizer, make_train_step)
    from train_sd15 import build_pipe

    mesh = make_mesh()
    pipe = build_pipe(args.tiny)
    total_dp = dict(mesh.shape)["data"] * dict(mesh.shape)["fsdp"]
    if args.batch_size % total_dp:
        raise ValueError(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"mesh's {total_dp} data-parallel devices")
    rng = jax.random.PRNGKey(args.seed)

    if args.init_ckpt:
        from prompt_diffusion_tpu.tools.torch_import import import_ldm_checkpoint

        params = jax.tree_util.tree_map(jnp.asarray, import_ldm_checkpoint(args.init_ckpt))
    else:
        params = jax.jit(lambda r: pipe.init_params(r, image_size=args.resolution))(rng)

    cfg = SD15TrainConfig(learning_rate=args.lr, sd_locked=True)
    tx = make_optimizer(cfg, {"controlnet": params["controlnet"]})
    state = init_train_state(cfg, params, tx)
    frozen = {k: params[k] for k in ("unet", "vae", "clip")}
    state = apply_sharding(state, shard_params(state, mesh))
    frozen = apply_sharding(frozen, shard_params(frozen, mesh))

    manager = ckpt.make_manager(f"{args.logdir}/checkpoints", save_every=args.ckpt_every)
    tokenizer = load_tokenizer(args.tokenizer_assets)

    kind_tasks = {"human_tasks": (), "nonhuman_tasks": ()}
    kind_tasks[f"{args.kind}_tasks"] = (args.task,)
    dm = ControlDataModule(args.data_root, res=args.resolution, shots=1, **kind_tasks)
    loader = dm.tuning_loader("train", args.batch_size,
                              num_supports=args.num_supports, seed=args.seed)

    step_fn = jax.jit(make_train_step(pipe, cfg, tx, mesh=mesh), donate_argnums=(0,))
    mlog = MetricLogger(args.logdir)
    bsh = batch_sharding(mesh)
    step_rng = jax.random.PRNGKey(args.seed + 1)

    it = iter(loader)
    t0 = time.perf_counter()
    for step in range(args.max_steps):
        mb = next(it)
        # meta batch → train-step batch: query group = index 0, support = 1
        images = mb["images"]  # (B, 2, H, W, 3) in [-1,1]
        conds = mb["conditions"][:, 0]  # (B, 2, H, W, 3) in [0,1], single task
        batch = {
            "image": images[:, 0],
            "query": conds[:, 0],
            "example_pair": np.concatenate([conds[:, 1], images[:, 1]], axis=-1),
            "token_ids": tokenizer([p[0] for p in mb["prompts"]]),
            "null_ids": tokenizer([""]),
        }
        dev = {k: jax.device_put(jnp.asarray(v), bsh if np.asarray(v).shape[0] > 1 else None)
               for k, v in batch.items()}
        state, metrics = step_fn(state, frozen, dev, step_rng)
        if step % 20 == 0:
            print(f"step {step} loss {float(metrics['loss']):.4f} "
                  f"({time.perf_counter() - t0:.1f}s)")
            t0 = time.perf_counter()
            mlog.log(step, metrics)
        ckpt.save_state(manager, step, state)
    ckpt.save_final(manager, args.max_steps - 1, state)
    print("done")


if __name__ == "__main__":
    main()

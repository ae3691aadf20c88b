"""Batch generation driver (TPU).

Consolidates the reference's three generation drivers:
  * generate_sd15.py — SD1.5 batch generation over LAION val
  * generate_train.py — SD3 generation, `--compute-fid` raw-PNG layout,
    `--black-support` ablation (zeroed support pair, :115,227-232)
  * generate_test.py — COCO-2017-val unseen-task generation

Rank sharding: shards the file list by jax.process_index()/count() —
the XLA-native analogue of eval/evaluate_gen.py's torch.distributed
rank sharding (:55-57).

  python generate.py --stack sd15 --ckpt ckpt.ckpt --data-root ... \
      --dataset laion --task hed --out-dir gen/ [--black-support]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--stack", choices=["sd15", "sd3"], default="sd15")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--random-init", action="store_true",
                   help="random-weight params instead of --ckpt — smoke/e2e "
                        "mechanics testing without model assets")
    p.add_argument("--data-root", required=True)
    p.add_argument("--dataset", choices=["laion", "coco"], default="laion")
    p.add_argument("--tasks", nargs="+", default=["hed"])
    p.add_argument("--out-dir", default="generated_images")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--cfg", type=float, default=5.0)
    p.add_argument("--control-scale", type=float, default=1.0)
    p.add_argument("--sampler", choices=["ddim", "unipc", "dpm++", "dpm", "plms"],
                   default="ddim",
                   help="sd15 denoise loop (sd3 is flow-match Euler only)")
    p.add_argument("--black-support", action="store_true",
                   help="zero the support pair (generate_train.py ablation)")
    p.add_argument("--compute-fid", action="store_true",
                   help="also dump raw PNGs under <out>/fid/<task>/")
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--tokenizer-assets", default=None)
    p.add_argument("--t5-assets", default=None,
                   help="dir with tokenizer.json or spiece.model; enables the "
                        "T5 branch of the SD3 triple text encoding")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    if args.stack == "sd3" and args.sampler != "ddim":
        raise SystemExit("--sampler applies to sd15 only; SD3 uses flow-match Euler")
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(args.tokenizer_assets)
    if args.stack == "sd15":
        from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
        from prompt_diffusion_tpu.tools.torch_import import import_ldm_checkpoint
        from prompt_diffusion_tpu.tools.diffusers_import import import_diffusers_folder

        pipe = PromptDiffusionSD15.create()
        if args.random_init:
            params = jax.jit(
                lambda r: pipe.init_params(r, image_size=args.resolution)
            )(jax.random.PRNGKey(args.seed))
        elif args.ckpt is None:
            raise SystemExit("--ckpt is required (or pass --random-init)")
        else:
            params = (
                import_diffusers_folder(args.ckpt)
                if os.path.isdir(args.ckpt)
                else import_ldm_checkpoint(args.ckpt)
            )
        _sd15_gen = pipe.jit_generate()

        def gen(params, key, ids, neg, pair, query, num_steps, guidance_scale,
                control_scale=1.0, prompts=None, neg_prompts=None):
            return _sd15_gen(params, key, ids, neg, pair, query,
                             num_steps=num_steps, guidance_scale=guidance_scale,
                             control_scale=control_scale, sampler=args.sampler)
    else:
        from prompt_diffusion_tpu.data.t5_tokenizer import load_t5_tokenizer
        from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd3 import PromptDiffusionSD3
        from prompt_diffusion_tpu.tools.diffusers_import import import_sd3_folder

        t5_tok = load_t5_tokenizer(args.t5_assets)
        t5 = None
        if t5_tok is not None:
            from prompt_diffusion_tpu.models.t5_text import T5Encoder

            t5 = T5Encoder()
        pipe = PromptDiffusionSD3.create(t5=t5)
        if args.random_init:
            from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

            params = jax.jit(lambda r: cast_params_bf16(
                pipe.init_params(r, image_size=args.resolution)
            ))(jax.random.PRNGKey(args.seed))
        elif args.ckpt is None:
            raise SystemExit("--ckpt is required (or pass --random-init)")
        else:
            params = import_sd3_folder(args.ckpt)
        if t5 is not None and "t5" not in params:
            raise SystemExit(
                "--t5-assets given but the checkpoint folder has no "
                "text_encoder_3/ — T5 weights are required for the T5 branch"
            )
        sd3_gen = pipe.jit_generate()

        def gen(params, key, ids, neg, pair, query, num_steps, guidance_scale,
                control_scale=1.0, prompts=None, neg_prompts=None):
            pd = {"l": ids, "g": ids}
            nd = {"l": neg, "g": neg}
            if t5_tok is not None:
                pd["t5"] = jnp.asarray(t5_tok(prompts))
                nd["t5"] = jnp.asarray(t5_tok(neg_prompts or [""] * len(prompts)))
            return sd3_gen(params, key, pd, nd, query,
                           pair[..., :3], pair[..., 3:],
                           num_steps=num_steps, guidance_scale=guidance_scale,
                           controlnet_conditioning_scale=control_scale)

    if args.dataset == "coco":
        from prompt_diffusion_tpu.data.coco_val import COCOValDataset

        ds = COCOValDataset(args.data_root, tasks=args.tasks, res=args.resolution)
        batch_iters = [(t, ds.batches(args.batch_size, t)) for t in args.tasks]
    else:
        from prompt_diffusion_tpu.data.laion_meta import ControlDataModule

        # partition requested tasks by dataset kind (the reference gates
        # laion_human on pose/densepose membership) — otherwise human
        # batches would be conditioned on pose regardless of --tasks
        human = tuple(t for t in args.tasks if t in ("pose", "densepose"))
        nonhuman = tuple(t for t in args.tasks if t not in ("pose", "densepose"))
        dm = ControlDataModule(args.data_root, res=args.resolution,
                               human_tasks=human, nonhuman_tasks=nonhuman)
        if args.max_batches is None:
            # the meta loader is an infinite round-robin sampler — default
            # to ~one pass over the val split instead of running forever
            total = sum(len(d["val"]) for d in dm.datasets.values())
            args.max_batches = max(1, total // args.batch_size)
            print(f"--max-batches not set; defaulting to one val epoch "
                  f"({args.max_batches} batches)")
        batch_iters = [("meta", iter(dm.loader("val", args.batch_size, seed=args.seed)))]

    rank, world = jax.process_index(), jax.process_count()
    os.makedirs(args.out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed + rank)

    n_done = 0
    for task, it in batch_iters:
        for bi, batch in enumerate(it):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            if bi % world != rank:
                continue
            # conditions stay in [0,1] — the convention BOTH reference
            # trainers and the diffusers generate flow use (condition
            # transforms are ToTensor-only, laion_meta_dataset.py:63;
            # control_image_processor has do_normalize=False,
            # pipeline_prompt_diffusion.py:236). Support images are [-1,1].
            # (The reference notebook feeds [-1,1] conditions — its own
            # train/inference inconsistency; examples/run_prompt_diffusion.py
            # mirrors the notebook, this driver mirrors the trained-model
            # convention.)
            if args.dataset == "coco":
                query = batch["condition"]
                # unseen-task eval uses a fixed support from the train set;
                # here: first item of the batch acts as support for the rest
                sup_img = batch["image"][:1].repeat(len(batch["image"]), 0)
                sup_cond = batch["condition"][:1].repeat(len(batch["image"]), 0)
                prompts = batch["prompt"]
                names = batch["name"]
            else:
                # meta batch: images (B, 2*shots, H,W,3); conditions (B,T,2s,...)
                images = batch["images"]
                conds = batch["conditions"][:, 0]
                query = conds[:, 0]
                sup_cond = conds[:, 1]
                sup_img = images[:, 1]
                prompts = [p[0] for p in batch["prompts"]]
                names = [f"b{bi:05d}_{j}" for j in range(len(prompts))]

            pair = np.concatenate([sup_cond, sup_img], axis=-1)
            if args.black_support:
                pair = np.zeros_like(pair)

            ids = jnp.asarray(tok(prompts))
            neg = jnp.asarray(tok([""] * len(prompts)))
            rng, sub = jax.random.split(rng)
            imgs = gen(params, sub, ids, neg, jnp.asarray(pair), jnp.asarray(query),
                       num_steps=args.steps, guidance_scale=args.cfg,
                       control_scale=args.control_scale, prompts=list(prompts))
            arr = (np.asarray(imgs) * 255).astype(np.uint8)
            # per-task subdir: coco multi-task runs reuse per-image names,
            # so a flat layout would have later tasks overwrite earlier ones
            task_dir = os.path.join(args.out_dir, task)
            os.makedirs(task_dir, exist_ok=True)
            for name, im in zip(names, arr):
                Image.fromarray(im).save(os.path.join(task_dir, f"{name}.png"))
                if args.compute_fid:
                    fid_dir = os.path.join(args.out_dir, "fid", task)
                    os.makedirs(fid_dir, exist_ok=True)
                    Image.fromarray(im).save(os.path.join(fid_dir, f"{name}.png"))
            n_done += len(arr)
            print(f"[{rank}/{world}] {task} batch {bi}: {n_done} images")
    print(f"rank {rank}: wrote {n_done} images → {args.out_dir}")


if __name__ == "__main__":
    main()

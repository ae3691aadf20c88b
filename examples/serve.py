"""Minimal serving deployment: load weights, warm the buckets, serve
concurrent Prompt-Diffusion requests through the micro-batching server.

    python examples/serve.py --ckpt network-step=04999.ckpt \
        --vocab /path/to/clip_vocab_dir --demo

`--demo` submits 4 concurrent requests with different prompts/seeds/
guidance scales (they share one batched execution) and writes PNGs.
See docs/SERVING.md for the architecture and sizing guidance.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="reference .ckpt/.safetensors (omit for random weights)")
    p.add_argument("--vocab", default=None, help="CLIP BPE vocab dir")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--out-dir", default="served_images")
    p.add_argument("--demo", action="store_true")
    args = p.parse_args()

    import jax

    from prompt_diffusion_tpu.data.tokenizer import load_tokenizer
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.serving import (
        GenerationRequest, GenerationServer, ServerConfig)

    pipe = PromptDiffusionSD15.create()
    if args.ckpt:
        from prompt_diffusion_tpu.tools.torch_import import import_ldm_checkpoint

        params = import_ldm_checkpoint(args.ckpt)
    else:
        print("no --ckpt: random weights (mechanics demo only)")
        params = jax.jit(
            lambda r: pipe.init_params(r, image_size=args.resolution)
        )(jax.random.PRNGKey(0))
    tok = load_tokenizer(args.vocab)

    server = GenerationServer(
        pipe, params, ServerConfig(max_batch=args.max_batch, flush_ms=25.0))

    res = args.resolution
    blank = np.zeros((res, res, 3), np.float32)

    def req(prompt, seed, guidance=9.0):
        return GenerationRequest(
            token_ids=np.asarray(tok([prompt]))[0],
            neg_token_ids=np.asarray(tok(["lowres, worst quality"]))[0],
            example_pair=np.concatenate([blank, blank], axis=-1),
            query=blank,
            num_steps=args.steps,
            guidance_scale=guidance,
            seed=seed,
        )

    with server:
        print("warming the serving bucket (first 512² compile is minutes)...")
        t0 = time.perf_counter()
        server.warmup(req("warmup", 0))
        print(f"warm in {time.perf_counter() - t0:.0f}s — accepting traffic")

        if args.demo:
            prompts = ["a modern house", "a red sports car",
                       "a snowy mountain", "a lighthouse at dusk"]
            futs = [server.submit(req(p, i, guidance=7.0 + i))
                    for i, p in enumerate(prompts)]
            os.makedirs(args.out_dir, exist_ok=True)
            from PIL import Image

            t0 = time.perf_counter()
            for i, (prompt, fut) in enumerate(zip(prompts, futs)):
                img = (fut.result() * 255).astype(np.uint8)
                Image.fromarray(img).save(f"{args.out_dir}/req{i}.png")
            dt = time.perf_counter() - t0
            print(f"served {len(prompts)} requests in {dt:.1f}s "
                  f"({server.stats['batches']} batched executions) → {args.out_dir}/")


if __name__ == "__main__":
    main()

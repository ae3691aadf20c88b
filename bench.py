"""Benchmark: SD1.5 Prompt-Diffusion 512², 50-step DDIM, CFG 9 — the
north-star config (BASELINE.md: images/sec/chip; p50 per-step latency).

Runs the full jitted pipeline (CLIP encode → ControlNet+UNet ×50 CFG
double-batched steps under lax.scan → VAE decode) on one chip with random
weights (numerics-identical workload to pretrained ones).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (SURVEY.md §6); the
comparison point is an A100 running the reference diffusers fp16+xformers
pipeline at ≈0.33 img/s for 512² 50-step ControlNet sampling (measured
community numbers for SD1.5+ControlNet; the BASELINE.json target is ≥5×
per chip).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

_T0 = time.perf_counter()

A100_REFERENCE_IMGS_PER_SEC = 0.33


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bf16-params", action="store_true",
                    help="cast weights to bf16 (halves weight HBM traffic)")
    args = ap.parse_args()

    import sys
    import time as _time

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15

    def log(msg):
        print(f"[bench +{_time.perf_counter() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)

    pipe = PromptDiffusionSD15.create()
    rng = jax.random.PRNGKey(0)
    log("initializing params (jitted init)...")
    init = jax.jit(lambda r: pipe.init_params(r, image_size=args.size), static_argnums=())
    params = init(rng)
    jax.block_until_ready(params)
    if args.bf16_params:
        from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

        params = jax.jit(cast_params_bf16)(params)
        jax.block_until_ready(params)
    log("params ready")

    b = args.batch
    ids = jnp.zeros((b, 77), jnp.int32)
    neg = jnp.zeros((b, 77), jnp.int32)
    pair = jnp.zeros((b, args.size, args.size, 6), jnp.float32)
    query = jnp.zeros((b, args.size, args.size, 3), jnp.float32)

    gen = pipe.jit_generate()

    def run(key):
        return gen(params, key, ids, neg, pair, query,
                   num_steps=args.steps, guidance_scale=9.0)

    # compile + warmup
    log("compiling generate program...")
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(1)).block_until_ready()
    compile_s = time.perf_counter() - t0
    log(f"compiled+warm in {compile_s:.0f}s; timing {args.iters} iters")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    imgs_per_sec = b / best
    per_step_ms = best / args.steps * 1e3  # whole-pipeline per-DDIM-step

    print(
        json.dumps(
            {
                "metric": f"images/sec/chip (SD1.5 PromptDiffusion {args.size}px, "
                          f"{args.steps}-step DDIM, CFG, batch {b})",
                "value": round(imgs_per_sec, 4),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 2),
            }
        )
    )
    # extra diagnostics to stderr so stdout stays one JSON line
    import sys

    print(
        f"p50_step_ms={per_step_ms:.1f} compile_s={compile_s:.1f} "
        f"times={[round(t, 2) for t in times]} device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

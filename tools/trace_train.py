"""Device trace of the SD1.5 ControlNet TRAIN step (dev tool).

Mirrors bench.py's train config exactly (remat UNet/ControlNet, bf16
frozen nets, donated state — BASELINE config 5) so the bucketed trace
explains the benched samples/s number: forward+backward convs/dots,
flash-attention VJP custom-calls, optimizer fusions, remat recompute.

    python tools/trace_train.py [--batch 4] [--size 512] [--steps 3]

Companion to tools/trace_step.py (inference ε-step) and tools/trace_sd3.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/pd_trace_train")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.training.sd15 import (
        SD15TrainConfig, init_train_state, make_optimizer, make_train_step)
    from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16
    from tools.trace_common import bucket_trace

    b, size = args.batch, args.size
    cfg_remat = UNetConfig(use_checkpoint=True)
    pipe = PromptDiffusionSD15.create(
        unet=UNetSD15(config=cfg_remat),
        controlnet=ControlNetSD15(config=cfg_remat),
    )
    print("initializing params...", file=sys.stderr)
    params = jax.jit(lambda r: pipe.init_params(r, image_size=size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    cfg = SD15TrainConfig(accum_steps=1, use_ema=False)
    trainable = {"controlnet": params["controlnet"]}
    tx = make_optimizer(cfg, trainable)
    state = init_train_state(cfg, params, tx)
    frozen = jax.jit(cast_params_bf16)(
        {k: v for k, v in params.items() if k != "controlnet"})
    jax.block_until_ready(frozen)
    del params
    step = jax.jit(make_train_step(pipe, cfg, tx), donate_argnums=(0,))

    batch = {
        "image": jnp.zeros((b, size, size, 3), jnp.float32),
        "query": jnp.zeros((b, size, size, 3), jnp.float32),
        "example_pair": jnp.zeros((b, size, size, 6), jnp.float32),
        "token_ids": jnp.zeros((b, 77), jnp.int32),
        "null_ids": jnp.zeros((1, 77), jnp.int32),
    }
    print("compiling train step...", file=sys.stderr)
    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    float(jnp.asarray(jax.tree_util.tree_leaves(metrics)[0], jnp.float32).sum())
    print(f"compiled in {time.perf_counter() - t0:.0f}s; tracing "
          f"{args.steps} steps", file=sys.stderr)

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2 + i))
            float(jnp.asarray(jax.tree_util.tree_leaves(metrics)[0],
                              jnp.float32).sum())
    bucket_trace(args.logdir, args.steps, args.top)


if __name__ == "__main__":
    main()

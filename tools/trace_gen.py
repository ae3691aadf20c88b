"""Trace the FULL jitted generate() (20 steps) and bucket device time
(dev tool) — accounts for everything bench.py measures: CLIP encode, hint
encode, the CFG denoise scan, DDIM update math, VAE decode.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from tools.trace_util import bucket, capture

    pipe = PromptDiffusionSD15.create()
    params = jax.jit(lambda r: pipe.init_params(r, image_size=args.size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("params ready", file=sys.stderr)

    b, s = args.batch, args.size
    ids = jnp.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (b, 77), 0, 49408), jnp.int32)
    neg = jnp.zeros((b, 77), jnp.int32)
    pair = jnp.zeros((b, s, s, 6))
    gen = pipe.jit_generate()

    def run(query):
        return gen(params, jax.random.PRNGKey(1), ids, neg, pair, query,
                   num_steps=args.steps)

    events = capture(run, jnp.zeros((b, s, s, 3)))
    bucket(events, trips=args.steps, top=args.top)


if __name__ == "__main__":
    main()

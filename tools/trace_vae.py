"""Trace the VAE decode path and bucket device time (dev tool).

217 ms measured for batch-4 512² decode vs ~40 ms conv-FLOP floor — this
shows where the rest goes.
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
    ap.add_argument("--trips", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from tools.trace_util import bucket, capture

    pipe = PromptDiffusionSD15.create()
    params = jax.jit(lambda r: pipe.init_params(r, image_size=args.size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready({"vae": params["vae"]})
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.size // 8, args.size // 8, 4))

    n = args.trips

    # params as jit arguments, not closure constants (tools/trace_sd3.py)
    def run_fn(p, z0):
        def body(c, i):
            img = pipe.decode_latents(p, z0 + 1e-3 * i)
            return c + jnp.sum(img), None
        return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

    run_jit = jax.jit(run_fn)
    events = capture(lambda z0: run_jit(params, z0), lat)
    bucket(events, trips=n, top=args.top)


if __name__ == "__main__":
    main()

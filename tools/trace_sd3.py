"""SD3 MMDiT ε-step device trace + bucketed analysis (dev tool).

Captures the full-size SD3 1024² CFG ε-step (transformer + controlnet,
CFG double batch = 2) for ~3 scan steps and buckets device op time —
the SD1.5-style trace the round-2 VERDICT asked for on SD3 (weak #4).

    python tools/trace_sd3.py [--int8] [--batch 1] [--size 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_util import bucket, capture


def build(int8: bool, size: int, batch: int):
    from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
    from prompt_diffusion_tpu.utils.dtypes import default_policy, int8_policy

    pol = int8_policy() if int8 else default_policy()
    # SD3-Medium dims (diffusers sd3 transformer config)
    tcfg = MMDiTConfig()
    ccfg = MMDiTConfig(num_layers=12)  # reference PD-SD3 controlnet depth
    tr = SD3Transformer(config=tcfg, policy=pol)
    cn = SD3ControlNet(config=ccfg, policy=pol)

    b2 = 2 * batch  # CFG double batch
    lh = size // 8
    lat = jnp.zeros((b2, lh, lh, 16), jnp.bfloat16)
    t = jnp.zeros((b2,), jnp.float32)
    ctx = jnp.zeros((b2, 154, 4096), jnp.bfloat16)  # 77 clip + 77 t5 slots
    pooled = jnp.zeros((b2, 2048), jnp.bfloat16)
    cond = jnp.zeros((b2, lh, lh, 16), jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    mat = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        tree)
    tparams = mat(jax.eval_shape(tr.init, rng, lat, t, ctx, pooled))
    cparams = mat(jax.eval_shape(cn.init, rng, lat, t, cond, cond, ctx, pooled))
    return tr, cn, tparams, cparams, (lat, t, ctx, pooled, cond)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    tr, cn, tparams, cparams, (lat, t, ctx, pooled, cond) = build(
        args.int8, args.size, args.batch)

    # params travel as jit ARGUMENTS — closing over them bakes ~6 GB of
    # weights into the lowering as constants, which the remote-compile
    # tunnel then serializes (measured: the capture blew a 30-min bound)
    def run_fn(tp, cp, x0):
        def step(x, i):
            tt = t + i.astype(jnp.float32)
            taps = cn.apply(cp, x * 0.999, tt, cond, cond, ctx, pooled,
                            conditioning_scale=1.0)
            eps = tr.apply(tp, x * 0.999, tt, ctx, pooled,
                           block_controlnet_hidden_states=taps)
            return (x + 1e-3 * eps.astype(x.dtype)), None

        return jax.lax.scan(step, x0, jnp.arange(args.steps))[0]

    run_jit = jax.jit(run_fn)
    run = lambda x0: run_jit(tparams, cparams, x0)
    t0 = time.perf_counter()
    events = capture(run, lat)
    print(f"capture done in {time.perf_counter() - t0:.0f}s "
          f"(int8={args.int8}, {args.size}px, CFG batch {2 * args.batch})",
          file=sys.stderr)
    bucket(events, trips=args.steps, top=args.top)


if __name__ == "__main__":
    main()

"""ε-step decomposition probe (dev tool).

Times one CFG double-batched ControlNet+UNet ε prediction (the 512² bench
hot loop) as a 20-step scan, under ablations that bound each optimization's
payoff: attention→identity (upper bound of all attention work), bf16
params, XLA-vs-Pallas attention.

Usage: python tools/step_probe.py [--batch 8] [--ablate none|noattn|xla]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(batch, size=512, context_dim=768, int8=False):
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.utils.dtypes import default_policy, int8_policy

    cfg = UNetConfig()
    pol = int8_policy() if int8 else default_policy()
    unet = UNetSD15(config=cfg, policy=pol)
    cnet = ControlNetSD15(config=cfg, policy=pol)
    lat = jnp.zeros((batch, size // 8, size // 8, 4), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, context_dim), jnp.float32)
    pair = jnp.zeros((batch, size, size, 6), jnp.float32)
    query = jnp.zeros((batch, size, size, 3), jnp.float32)

    rng = jax.random.PRNGKey(0)
    uparams = jax.eval_shape(unet.init, rng, lat, t, ctx)
    cparams = jax.eval_shape(cnet.init, rng, lat, t, pair, query, ctx)
    mat = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), tree)
    return unet, cnet, mat(uparams), mat(cparams), (lat, t, ctx, pair, query)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ablate", default="none",
                    choices=["none", "noattn", "xla", "nosmax"])
    ap.add_argument("--bf16-params", action="store_true")
    ap.add_argument("--inner", type=int, default=20)
    args = ap.parse_args()

    patches = []
    if args.ablate == "noattn":
        # attention → v passthrough: bounds ALL attention cost
        import prompt_diffusion_tpu.ops.attention as attn_mod
        import prompt_diffusion_tpu.ops.flash_attention as fa_mod

        patches.append(mock.patch.object(
            attn_mod, "dot_product_attention",
            lambda q, k, v, **kw: jnp.broadcast_to(
                jnp.mean(v, axis=1, keepdims=True), q.shape[:1] + (q.shape[1],) + v.shape[2:]
            ).astype(v.dtype)))
        patches.append(mock.patch.object(
            fa_mod, "flash_attention_packed",
            lambda q, k, v, h, scale=None: jnp.broadcast_to(
                jnp.mean(v, axis=1, keepdims=True), q.shape).astype(v.dtype)))
        import prompt_diffusion_tpu.models.layers as layers_mod
        patches.append(mock.patch.object(
            layers_mod, "dot_product_attention", patches[0].new))
    elif args.ablate == "xla":
        import prompt_diffusion_tpu.ops.attention as attn_mod
        patches.append(mock.patch.object(
            attn_mod, "_kernel_eligible", lambda nq: False))
        patches.append(mock.patch.object(
            attn_mod, "_flash_eligible", lambda q, k, m: False))

    for p in patches:
        p.start()

    unet, cnet, uparams, cparams, (lat, t, ctx, pair, query) = build(args.batch)
    if args.bf16_params:
        from prompt_diffusion_tpu.utils.dtypes import cast_params_bf16

        uparams = jax.jit(cast_params_bf16)(uparams)
        cparams = jax.jit(cast_params_bf16)(cparams)

    hint = cnet.apply(cparams, example_pair=pair, query=query, hint_only=True)
    jax.block_until_ready(hint)

    def eps(x, tt):
        control = cnet.apply(cparams, x, tt, context=ctx, guided_hint=hint)
        return unet.apply(uparams, x, tt, ctx, control=control)

    def step(x, i):
        tt = jnp.full((args.batch,), i, jnp.int32)
        return eps(x * 0.999, tt), None

    run = jax.jit(lambda x0: jax.lax.scan(step, x0, jnp.arange(args.inner))[0])
    t0 = time.perf_counter()
    jax.block_until_ready(run(lat))
    print(f"compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    times = []
    for i in range(3):
        x0 = lat + 1e-3 * i
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append((time.perf_counter() - t0) / args.inner)
    ms = min(times) * 1e3
    print(f"ablate={args.ablate} bf16_params={args.bf16_params} batch={args.batch}: "
          f"{ms:.2f} ms/step")


if __name__ == "__main__":
    main()

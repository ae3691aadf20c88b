"""Quantify the non-denoise fixed cost of generate(): VAE decode, CLIP
encode, and dispatch (dev tool).

Measurement rules (.claude/skills/verify): per-call timings lie on this
runtime — every quantity is measured as a ≥16-iteration jitted lax.scan
over varying inputs with a forced readback, divided by the trip count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, arg, label, trips):
    fn_j = jax.jit(fn)
    float(jnp.sum(fn_j(arg)))  # compile
    best = 1e9
    for i in range(3):
        a = arg + 1e-4 * (i + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(jnp.sum(fn_j(a)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / trips * 1e3:.1f} ms/trip  ({best * 1e3:.1f} ms / {trips})")
    return best / trips


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--trips", type=int, default=16)
    args = ap.parse_args()

    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15

    pipe = PromptDiffusionSD15.create()
    params = jax.jit(lambda r: pipe.init_params(r, image_size=args.size))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("params ready", file=sys.stderr)

    b, s, n = args.batch, args.size, args.trips
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, s // 8, s // 8, 4))

    def dec_n(z0):
        def body(c, i):
            img = pipe.decode_latents(params, z0 + 1e-3 * i)
            return c + jnp.sum(img), None
        return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

    t_dec = timed(dec_n, lat, f"VAE decode (batch {b})", n)

    ids = jnp.zeros((b, 77), jnp.int32)

    def enc_n(z0):
        def body(c, i):
            ctx = pipe.encode_prompt(params, ids + i.astype(jnp.int32))
            return c + jnp.sum(ctx) + z0.sum() * 0.0, None
        return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

    t_enc = timed(enc_n, lat, f"CLIP encode x2 halves (batch {b})", n)

    def hint_n(z0):
        pair = jnp.zeros((2 * b, s, s, 6)) + z0.sum() * 0.0
        query = jnp.zeros((2 * b, s, s, 3))
        def body(c, i):
            h = pipe.controlnet.apply(
                params["controlnet"], example_pair=pair + 1e-3 * i, query=query,
                hint_only=True)
            return c + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(h)), None
        return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

    t_hint = timed(hint_n, lat, f"hint encoder (batch {2 * b})", n)

    # full generate at two step counts → per-step slope + intercept
    gen = pipe.jit_generate()
    ids_p = jnp.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (b, 77), 0, 49408), jnp.int32)
    pair = jnp.zeros((b, s, s, 6))
    query = jnp.zeros((b, s, s, 3))

    def wall(steps):
        gen(params, jax.random.PRNGKey(0), ids_p, ids, pair, query,
            num_steps=steps).block_until_ready()
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            gen(params, jax.random.PRNGKey(i + 1), ids_p, ids, pair, query,
                num_steps=steps).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t20, t50 = wall(20), wall(50)
    slope = (t50 - t20) / 30.0
    fixed = t50 - slope * 50
    print(f"generate: 20-step {t20 * 1e3:.0f} ms, 50-step {t50 * 1e3:.0f} ms")
    print(f"→ per-step {slope * 1e3:.1f} ms, fixed intercept {fixed * 1e3:.0f} ms")
    print(f"accounted fixed: dec {t_dec * 1e3:.0f} + enc {2 * t_enc * 1e3:.0f} "
          f"+ hint {t_hint * 1e3:.0f} ms")


if __name__ == "__main__":
    main()

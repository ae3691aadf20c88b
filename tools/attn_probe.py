"""Attention micro-benchmark (dev tool).

Times attention variants at the Prompt-Diffusion hot shapes following the
only trustworthy methodology on this runtime (see docs/ROADMAP.md): a
jitted ≥20-step lax.scan whose inputs change every step, with a forced
scalar readback at the end.

Usage: python tools/attn_probe.py [--shape ds1|ds2|cross] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = {
    # (B, Nq, Nk, H, D) — bench config: batch 4 CFG-doubled → B=8
    "ds1": (8, 4096, 4096, 8, 40),
    "ds2": (8, 1024, 1024, 8, 80),
    "ds4": (8, 256, 256, 8, 160),
    "cross1": (8, 4096, 77, 8, 40),
}


def time_fn(name, fn, make_inputs, iters=20, inner=20):
    """fn maps (q,k,v)->out; scan `inner` applications with varying q."""

    def step(carry, i):
        q, k, v = make_inputs(i)
        out = fn(q, k, v)
        return carry + jnp.sum(out.astype(jnp.float32)), None

    run = jax.jit(lambda: jax.lax.scan(step, 0.0, jnp.arange(inner))[0])
    # compile+warm
    float(run())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        times.append((time.perf_counter() - t0) / inner)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="ds1")
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    b, nq, nk, h, d = SHAPES[args.shape]
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    scale = d**-0.5

    base_q = jax.random.normal(jax.random.PRNGKey(0), (b, nq, h * d), dt)
    base_k = jax.random.normal(jax.random.PRNGKey(1), (b, nk, h * d), dt)
    base_v = jax.random.normal(jax.random.PRNGKey(2), (b, nk, h * d), dt)

    def make_packed(i):
        return base_q * (1 + 1e-4 * i), base_k, base_v

    def make_bnhd(i):
        q, k, v = make_packed(i)
        return (
            q.reshape(b, nq, h, d),
            k.reshape(b, nk, h, d),
            v.reshape(b, nk, h, d),
        )

    flops = 4 * b * h * nq * nk * d  # QK^T + PV

    from prompt_diffusion_tpu.ops.attention import dot_product_attention
    from prompt_diffusion_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_packed,
    )

    variants = [
        ("xla_bnhd", lambda q, k, v: dot_product_attention(q, k, v, use_flash=False), make_bnhd),
        ("pallas_packed", lambda q, k, v: flash_attention_packed(q, k, v, h), make_packed),
    ]
    if nq == nk:  # self-attn only
        variants.append(
            ("pallas_bnhd", lambda q, k, v: flash_attention(q, k, v), make_bnhd)
        )
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as jax_fa,
            )

            def jax_flash(q, k, v):
                # expects (B,H,N,D)
                qt = q.reshape(b, nq, h, d).transpose(0, 2, 1, 3)
                kt = k.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
                vt = v.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
                o = jax_fa(qt * scale, kt, vt, causal=False)
                return o.transpose(0, 2, 1, 3).reshape(b, nq, h * d)

            variants.append(("jax_flash_ops", jax_flash, make_packed))
        except ImportError:
            pass

    print(f"shape={args.shape} B={b} Nq={nq} Nk={nk} H={h} D={d} {args.dtype}")
    for name, fn, mk in variants:
        try:
            t = time_fn(name, fn, mk)
            print(f"  {name:18s} {t*1e3:8.3f} ms   {flops/t/1e12:6.1f} TF/s effective")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:18s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

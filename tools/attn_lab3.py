"""Round-2 attention lab 3: head-padding for lane alignment.

At D=40 the packed kernel's per-head column slices (offsets 40,80,...)
cross 128-lane tile boundaries → Mosaic inserts lane rotations on every
q/k/v slice and output write. Zero-padding each head to D'=64 or 128
costs NO extra MXU passes (contraction dim pads to 128 either way) and
makes every slice aligned. In production the padding folds into the
to_q/to_k/to_v/to_out projection weights (zero rows/cols) — free.

Variants (all prescaled-q, fullk packed, block_q=256/512):
  P64   heads padded to 64  (HD=512)
  P128  heads padded to 128 (HD=1024)
  vs the D=40 baseline from lab2 (4.68 ms).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_fn(fn, make_inputs, inner=20):
    def step(carry, i):
        q, k, v = make_inputs(i)
        out = fn(q, k, v)
        return carry + jnp.sum(out.astype(jnp.float32)), None

    run = jax.jit(lambda: jax.lax.scan(step, 0.0, jnp.arange(inner))[0])
    float(run())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        times.append((time.perf_counter() - t0) / inner)
    return min(times)


def _fullk_packed(q_ref, k_ref, v_ref, o_ref, *, num_heads):
    q = q_ref[0]
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


def make_packed(b, n, hd, block_q, dtype, num_heads, vmem_mb=110):
    return pl.pallas_call(
        functools.partial(_fullk_packed, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), dtype),
        grid=(b, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0)),
            pl.BlockSpec((1, n, hd), lambda i, qb: (i, 0, 0)),
            pl.BlockSpec((1, n, hd), lambda i, qb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 2**20,
        ),
    )


def main():
    b, n, h, d = 8, 4096, 8, 40
    scale = d**-0.5
    dt = jnp.bfloat16
    flops = 4 * b * h * n * n * d
    key = jax.random.PRNGKey

    q0 = jax.random.normal(key(0), (b, n, h * d), dt) * jnp.asarray(scale, dt)
    k0 = jax.random.normal(key(1), (b, n, h * d), dt)
    v0 = jax.random.normal(key(2), (b, n, h * d), dt)

    from prompt_diffusion_tpu.ops.flash_attention import flash_attention_packed
    ref = jax.jit(lambda a, b_, c: flash_attention_packed(a, b_, c, h, 1.0))(q0, k0, v0)
    jax.block_until_ready(ref)

    def pad_heads(x, dp):
        b_, n_, hd_ = x.shape
        xs = x.reshape(b_, n_, h, hd_ // h)
        return jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, dp - hd_ // h))).reshape(
            b_, n_, h * dp)

    print(f"B={b} N={n} H={h} D={d} bf16; padded-MXU floor ≈ "
          f"{flops * (128 / d) / 197e12 * 1e3:.2f} ms; baseline(D=40) 4.68 ms")
    for dp, bq in ((64, 256), (64, 512), (128, 256), (128, 512)):
        qp = jax.jit(lambda x: pad_heads(x, dp))(q0)
        kp = jax.jit(lambda x: pad_heads(x, dp))(k0)
        vp = jax.jit(lambda x: pad_heads(x, dp))(v0)
        jax.block_until_ready((qp, kp, vp))
        mk = lambda i: (qp * (1 + 1e-4 * i), kp, vp)
        try:
            fn = make_packed(b, n, h * dp, bq, dt, h)
            out = fn(qp, kp, vp)
            # compare the un-padded head columns
            ov = out.reshape(b, n, h, dp)[..., :d].reshape(b, n, h * d)
            err = float(jnp.max(jnp.abs(ov.astype(jnp.float32) - ref.astype(jnp.float32))))
            t = time_fn(fn, mk)
            print(f"  P{dp} bq{bq}: {t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  P{dp} bq{bq}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()

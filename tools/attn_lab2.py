"""Round-2 attention lab (dev tool): VPU-pass reduction on the full-K
packed kernel. Hypothesis from round 1: at D=40 the MXU floor is ~2.8 ms
(61 TF/s padded) and the kernel sits at ~4.6 ms → the gap is softmax VPU
passes (scale-mult, max, exp, sum, div) that don't overlap the MXU.

Variants:
  A  current packed fullk (baseline, block_q=256)
  B  q pre-scaled outside kernel (kills the (bq,Nk) fp32 scale pass)
  C  B + block_q=512
  D  B + heads via one batched dot_general (H as batch dim)
  E  B + 1/l folded into PV via acc*(1/l) on the (bq,D) output only (already
     done) + exp in-place ordering; separate max/sum kept
  F  B + block_q=128
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


def _fullk_packed(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, prescaled):
    q = q_ref[0]
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if not prescaled:
            s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


def _fullk_batched_heads(q_ref, k_ref, v_ref, o_ref, *, num_heads):
    """One batched dot_general over all H heads (H = MXU batch dim)."""
    bq = q_ref.shape[1]
    nk = k_ref.shape[1]
    d = q_ref.shape[-1] // num_heads
    q = q_ref[0].reshape(bq, num_heads, d).transpose(1, 0, 2)  # (H,bq,D)
    k = k_ref[0].reshape(nk, num_heads, d).transpose(1, 0, 2)
    v = v_ref[0].reshape(nk, num_heads, d).transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (H,bq,Nk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (H,bq,D)
    o_ref[0] = (o / l).transpose(1, 0, 2).reshape(bq, num_heads * d).astype(o_ref.dtype)


def make_packed(kernel, b, n, hd, block_q, dtype, vmem_mb=110, **kw):
    return pl.pallas_call(
        functools.partial(kernel, **kw),
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
    hd = h * d
    scale = d**-0.5
    dt = jnp.bfloat16
    q0 = jax.random.normal(jax.random.PRNGKey(0), (b, n, hd), dt)
    k0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, hd), dt)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (b, n, hd), dt)
    mk = lambda i: (q0 * (1 + 1e-4 * i), k0, v0)
    mk_scaled = lambda i: ((q0 * (1 + 1e-4 * i)) * jnp.asarray(scale, dt), k0, v0)
    flops = 4 * b * h * n * n * d

    # reference output for correctness: the existing packed kernel (itself
    # parity-tested vs einsum in test_ops.py). The XLA einsum at this shape
    # materializes 8.6 GB of logits and OOMs the chip.
    from prompt_diffusion_tpu.ops.flash_attention import flash_attention_packed
    ref = jax.jit(lambda a, b_, c: flash_attention_packed(a, b_, c, h, scale))(q0, k0, v0)
    jax.block_until_ready(ref)

    runs = [
        ("A  packed fullk bq256 (current)", _fullk_packed, 256,
         dict(scale=scale, num_heads=h, prescaled=False), mk, False),
        ("B  prescaled-q bq256", _fullk_packed, 256,
         dict(scale=scale, num_heads=h, prescaled=True), mk_scaled, True),
        ("C  prescaled-q bq512", _fullk_packed, 512,
         dict(scale=scale, num_heads=h, prescaled=True), mk_scaled, True),
        ("F  prescaled-q bq128", _fullk_packed, 128,
         dict(scale=scale, num_heads=h, prescaled=True), mk_scaled, True),
        ("D  batched-heads bq256", _fullk_batched_heads, 256,
         dict(num_heads=h), mk_scaled, True),
        ("D2 batched-heads bq512", _fullk_batched_heads, 512,
         dict(num_heads=h), mk_scaled, True),
    ]
    print(f"B={b} N={n} H={h} D={d} bf16; MXU-padded floor ≈ "
          f"{flops * (128/d) / 4 / 197e12 * 1e3:.2f} ms")
    for name, kern, bq, kw, mkfn, prescaled in runs:
        try:
            fn = make_packed(kern, b, n, hd, bq, dt, **kw)
            out = fn(*mkfn(0))
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t = time_fn(fn, mkfn)
            print(f"  {name:32s} {t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s  maxerr={err:.4f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

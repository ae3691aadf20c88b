"""int8 attention kernel lab (dev tool): where do the 3.2 ms above the
1.9 ms int8-MXU floor go, and which variant wins at the SD3 joint shape?

The shipped `flash_attention_packed_int8` (5.09 ms/site) spends VPU time
on fp32 passes over the (block_q, Nk) logits tile: scale multiply
(sq·sk), softmax, and a P→int8 requant (round+clip+convert). Variants:

  v1  shipped kernel (int8 QKᵀ + int8 PV, per-row K scales)
  v2  int8 QKᵀ + *bf16* PV — drop the P-requant and V-quant entirely;
      PV pays the bf16 MXU rate but saves ~3 N² VPU passes
  v3  v2 + per-HEAD scalar K scales — the (1,Nk) row-vector multiply
      becomes a scalar folded into `scale` (one fewer N² pass); K
      quantization error grows from per-row to per-head granularity

    python tools/attn_int8_lab.py [--iters 20] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prompt_diffusion_tpu.ops.flash_attention import (
    _pick_block,
    _xla_attention,
    flash_attention_packed,
    flash_attention_packed_int8,
)

B, N, H, D = 2, 4096 + 154, 24, 64


# --- v2: int8 QKᵀ, bf16 PV ------------------------------------------------

def _kernel_v2(q_ref, k_ref, sk_ref, v_ref, o_ref, *, scale, num_heads):
    q = q_ref[0]
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1, keepdims=True) / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(qh / sq), -127, 127).astype(jnp.int8)
        ki = k_ref[0, :, h * d:(h + 1) * d]
        s32 = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        sk = sk_ref[0, h][None, :]
        s = s32.astype(jnp.float32) * (sq * sk) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        vh = v_ref[0, :, h * d:(h + 1) * d]  # bf16
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = (o / l).astype(o_ref.dtype)


def attn_int8_v2(q, k, v, num_heads, scale, interpret=False):
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // num_heads
    kf = k.astype(jnp.float32).reshape(b, nk, num_heads, d)
    skr = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1) / 127.0, 1e-8)
    ki = jnp.clip(jnp.round(kf / skr[..., None]), -127, 127).astype(jnp.int8)
    ki = ki.reshape(b, nk, hd)
    sk = jnp.transpose(skr, (0, 2, 1))
    nq_pad = (-nq) % 256 if nq >= 256 else 0
    if nq_pad:
        q = jnp.pad(q, ((0, 0), (0, nq_pad), (0, 0)))
    nqp = nq + nq_pad
    block_q = _pick_block(nqp, 256)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, scale=float(scale), num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, nqp, hd), q.dtype),
        grid=(b, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, nk), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, ki, sk, v)
    return out[:, :nq] if nq_pad else out


# --- v3: v2 + per-head scalar K scale ------------------------------------

def _kernel_v3(q_ref, k_ref, skh_ref, v_ref, o_ref, *, scale, num_heads):
    q = q_ref[0]
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1, keepdims=True) / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(qh / sq), -127, 127).astype(jnp.int8)
        ki = k_ref[0, :, h * d:(h + 1) * d]
        s32 = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # per-head scalar K scale folds with the row Q scale: one fused
        # (column-broadcast) multiply instead of row-vector + column-vector
        s = s32.astype(jnp.float32) * (sq * (skh_ref[0, 0, h] * scale))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        vh = v_ref[0, :, h * d:(h + 1) * d]
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * d:(h + 1) * d] = (o / l).astype(o_ref.dtype)


def attn_int8_v3(q, k, v, num_heads, scale, interpret=False):
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // num_heads
    kf = k.astype(jnp.float32).reshape(b, nk, num_heads, d)
    skh = jnp.maximum(jnp.max(jnp.abs(kf), axis=(1, 3)) / 127.0, 1e-8)  # (B, H)
    ki = jnp.clip(jnp.round(kf / skh[:, None, :, None]), -127, 127).astype(jnp.int8)
    ki = ki.reshape(b, nk, hd)
    skh = skh[:, None, :]  # (B, 1, H): block shapes match last two dims
    nq_pad = (-nq) % 256 if nq >= 256 else 0
    if nq_pad:
        q = jnp.pad(q, ((0, 0), (0, nq_pad), (0, 0)))
    nqp = nq + nq_pad
    block_q = _pick_block(nqp, 256)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, scale=float(scale), num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, nqp, hd), q.dtype),
        grid=(b, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_heads), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, ki, skh, v)
    return out[:, :nq] if nq_pad else out


def timed(name, fn, x0, iters):
    def loop(x):
        def body(c, _):
            o = fn(c)
            return (c + 1e-6 * o).astype(c.dtype), None
        return jax.lax.scan(body, x, jnp.arange(iters))[0]

    run = jax.jit(loop)
    t0 = time.perf_counter()
    float(jnp.sum(run(x0).astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(run(x0 * 1.0001).astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:30s} {ms:8.2f} ms/site  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", help="interpret-mode correctness only")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    scale = D ** -0.5
    interp = args.cpu

    nc = 1024 + 154
    qs = jnp.asarray(rng.normal(size=(B, nc, H, D)) * 0.5, jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda a: _xla_attention(a, a, a, scale))(qs), np.float32)
    qp = qs.reshape(B, nc, H * D)
    for name, fn in [
        ("v2 int8-QK/bf16-PV", attn_int8_v2),
        ("v3 +per-head K scale", attn_int8_v3),
    ]:
        out = np.asarray(
            jax.jit(lambda a: fn(a, a, a, H, scale, interpret=interp))(qp),
            np.float32).reshape(B, nc, H, D)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        print(f"{name}: rel l2 vs exact = {rel:.4f}", flush=True)
    if args.cpu:
        return

    qfull = jnp.asarray(rng.normal(size=(B, N, H * D)) * 0.5, jnp.bfloat16)
    timed("v1 shipped int8",
          lambda x: flash_attention_packed_int8(x, x, x, H, scale), qfull, args.iters)
    timed("v2 int8-QK/bf16-PV",
          lambda x: attn_int8_v2(x, x, x, H, scale), qfull, args.iters)
    timed("v3 +per-head K scale",
          lambda x: attn_int8_v3(x, x, x, H, scale), qfull, args.iters)
    timed("bf16 packed (baseline)",
          lambda x: flash_attention_packed(x, x, x, H, scale), qfull, args.iters)


if __name__ == "__main__":
    main()

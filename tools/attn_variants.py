"""Attention kernel variant lab (dev tool): isolates what limits the D=40
flash kernel — softmax VPU passes, MXU pipelining, block shape, grid
semantics. Same scan-timing methodology as attn_probe.py."""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


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


# --- variant kernels (BNHD, (B,H,N,D) pre-transposed) ----------------------

def _online_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, do_softmax=True):
    q = q_ref[0, 0]
    block_q, d = q.shape
    nk = k_ref.shape[2]

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if do_softmax:
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_i - m_new)
            l_new = l_i * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_new, l_new
        acc = acc + jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_i, l_i

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, nk // block_k, body, (acc0, m0, l0))
    if do_softmax:
        o_ref[0, 0] = (acc / l_i).astype(o_ref.dtype)
    else:
        o_ref[0, 0] = acc.astype(o_ref.dtype)


def _fullk_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """No online correction: whole-K logits row in VMEM, single softmax."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def make_variant(kernel, b, h, nq, nk, d, block_q, dtype, dimsem=None, vmem_mb=None,
                 **kw):
    cp = {}
    if dimsem is not None or vmem_mb is not None:
        cp["compiler_params"] = pltpu.CompilerParams(
            **({"dimension_semantics": dimsem} if dimsem else {}),
            **({"vmem_limit_bytes": vmem_mb * 2**20} if vmem_mb else {}),
        )
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), dtype),
        grid=(b, h, nq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, qb: (i, j, qb, 0)),
            pl.BlockSpec((1, 1, nk, d), lambda i, j, qb: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, nk, d), lambda i, j, qb: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda i, j, qb: (i, j, qb, 0)),
        **cp,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=40)
    args = ap.parse_args()
    b, n, h, d = args.b, args.n, args.h, args.d
    scale = d**-0.5
    dt = jnp.bfloat16

    q0 = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d), dt)
    k0 = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d), dt)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d), dt)
    mk = lambda i: (q0 * (1 + 1e-4 * i), k0, v0)
    flops = 4 * b * h * n * n * d

    par3 = ("parallel", "parallel", "arbitrary")
    runs = [
        ("online bq512 bk512 (current)", _online_kernel,
         dict(block_q=512, block_k=512, scale=scale)),
        ("online bq512 bk512 par", _online_kernel,
         dict(block_q=512, block_k=512, scale=scale, dimsem=par3)),
        ("online bq1024 bk128 par", _online_kernel,
         dict(block_q=1024, block_k=128, scale=scale, dimsem=par3)),
        ("online bq1024 bk256 par", _online_kernel,
         dict(block_q=1024, block_k=256, scale=scale, dimsem=par3)),
        ("online bq2048 bk256 par", _online_kernel,
         dict(block_q=2048, block_k=256, scale=scale, dimsem=par3)),
        ("online-NOSOFTMAX bq512 bk512", _online_kernel,
         dict(block_q=512, block_k=512, scale=scale, do_softmax=False)),
        ("fullk bq256 par", _fullk_kernel, dict(block_q=256, scale=scale, dimsem=par3, vmem_mb=100)),
        ("fullk bq512 par", _fullk_kernel, dict(block_q=512, scale=scale, dimsem=par3, vmem_mb=100)),
        ("fullk bq1024 par", _fullk_kernel, dict(block_q=1024, scale=scale, dimsem=par3, vmem_mb=110)),
    ]
    print(f"B={b} N={n} H={h} D={d} bf16; flops/site={flops/1e9:.1f} GF")
    for name, kern, cfg in runs:
        cfg = dict(cfg)
        block_q = cfg.pop("block_q")
        dimsem = cfg.pop("dimsem", None)
        vmem_mb = cfg.pop("vmem_mb", None)
        try:
            fn = make_variant(kern, b, h, n, n, d, block_q, dt, dimsem=dimsem,
                              vmem_mb=vmem_mb, **cfg)
            t = time_fn(fn, mk)
            print(f"  {name:32s} {t*1e3:8.3f} ms   {flops/t/1e12:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:32s} FAILED: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__" and "--packed" not in sys.argv:
    main()


# --- packed fullk variant (heads packed on last axis, no transposes) --------

def _fullk_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads):
    q = q_ref[0]  # (block_q, H*D)
    nk = k_ref.shape[1]
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


def make_fullk_packed(b, n, h, d, block_q, dtype, scale, dimsem=True, vmem_mb=110):
    return pl.pallas_call(
        functools.partial(_fullk_packed_kernel, scale=scale, num_heads=h),
        out_shape=jax.ShapeDtypeStruct((b, n, h * d), dtype),
        grid=(b, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, h * d), lambda i, qb: (i, qb, 0)),
            pl.BlockSpec((1, n, h * d), lambda i, qb: (i, 0, 0)),
            pl.BlockSpec((1, n, h * d), lambda i, qb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h * d), lambda i, qb: (i, qb, 0)),
        compiler_params=pltpu.CompilerParams(
            **({"dimension_semantics": ("parallel", "arbitrary")} if dimsem else {}),
            vmem_limit_bytes=vmem_mb * 2**20,
        ),
    )


def packed_main():
    b, n, h, d = 8, 4096, 8, 40
    scale = d**-0.5
    dt = jnp.bfloat16
    q0 = jax.random.normal(jax.random.PRNGKey(0), (b, n, h * d), dt)
    k0 = jax.random.normal(jax.random.PRNGKey(1), (b, n, h * d), dt)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (b, n, h * d), dt)
    mk = lambda i: (q0 * (1 + 1e-4 * i), k0, v0)
    flops = 4 * b * h * n * n * d

    import sys
    sys.path.insert(0, "/root/repo")
    from prompt_diffusion_tpu.ops.flash_attention import flash_attention_packed

    # correctness
    ref = flash_attention_packed(q0, k0, v0, h)
    for bq in (256, 512):
        fn = make_fullk_packed(b, n, h, d, bq, dt, scale)
        out = fn(q0, k0, v0)
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        t = time_fn(fn, mk)
        print(f"fullk_packed bq{bq}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TF/s  maxerr={float(err):.5f}")
    t = time_fn(lambda q, k, v: flash_attention_packed(q, k, v, h), mk)
    print(f"current packed:     {t*1e3:.3f} ms  {flops/t/1e12:.1f} TF/s")


if __name__ == "__main__" and "--packed" in sys.argv:
    packed_main()

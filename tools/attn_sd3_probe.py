"""SD3 joint-attention shape probe (dev tool): correctness + timing of the
attention variants at B=2 (CFG), N=4096+154=4250, H=24, D=64.

Validates the Nq-padding fix (4250 has no power-of-two divisor — the old
path ran ONE whole-sequence q block) and the int8 QKᵀ/PV kernel, with
chained-dependency timing + forced readback per the axon measurement
rules.

    python tools/attn_sd3_probe.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.ops.flash_attention import (
    _xla_attention,
    flash_attention,
    flash_attention_packed,
    flash_attention_packed_int8,
)

B, N, H, D = 2, 4096 + 154, 24, 64


def timed(name, fn, x0, iters):
    """Chain iterations through a data dependency; force readback."""

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
    total = time.perf_counter() - t0
    ms = total / iters * 1e3
    print(f"{name:34s} {ms:8.2f} ms/site  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep block_q_target for both packed kernels")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    scale = D ** -0.5

    print(f"shape: B={B} N={N} H={H} D={D}  "
          f"real flops/site = {4 * B * N * N * H * D / 1e9:.1f} GF", flush=True)

    # correctness at a REDUCED odd length (full-size XLA-einsum reference
    # needs a 6.9 GB logits buffer and has stalled the remote compiler)
    nc = 1024 + 154
    qs = jnp.asarray(rng.normal(size=(B, nc, H, D)) * 0.5, jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(B, nc, H, D)) * 0.5, jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(B, nc, H, D)) * 0.5, jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda a, b, c: _xla_attention(a, b, c, scale))(qs, ks, vs),
                     np.float32)
    out = np.asarray(jax.jit(lambda a, b, c: flash_attention(a, b, c, scale=scale))(
        qs, ks, vs), np.float32)
    err = np.abs(out - ref).max()
    print(f"bnhd kernel vs xla (N={nc}): max|Δ| = {err:.4f} (bf16 tol ~0.03)",
          flush=True)
    assert err < 0.1

    qc = qs.reshape(B, nc, H * D)
    kc = ks.reshape(B, nc, H * D)
    vc = vs.reshape(B, nc, H * D)
    outp = np.asarray(jax.jit(
        lambda a, b, c: flash_attention_packed(a, b, c, H, scale))(qc, kc, vc),
        np.float32).reshape(B, nc, H, D)
    print(f"packed kernel vs xla: max|Δ| = {np.abs(outp - ref).max():.4f}", flush=True)

    outi = np.asarray(jax.jit(
        lambda a, b, c: flash_attention_packed_int8(a, b, c, H, scale))(qc, kc, vc),
        np.float32).reshape(B, nc, H, D)
    erri = np.abs(outi - ref)
    rel = np.linalg.norm(outi - ref) / np.linalg.norm(ref)
    print(f"int8 kernel vs xla: max|Δ| = {erri.max():.4f}  rel l2 = {rel:.4f}",
          flush=True)

    # timings at the FULL shape — kernels only (self-attn: k=v=q)
    qs = jnp.asarray(rng.normal(size=(B, N, H, D)) * 0.5, jnp.bfloat16)
    qp = qs.reshape(B, N, H * D)
    timed("bnhd flash (padded q)", lambda x: flash_attention(x, x, x, scale=scale),
          qs, args.iters)
    timed("packed full-K bf16",
          lambda x: flash_attention_packed(x, x, x, H, scale), qp, args.iters)
    timed("packed full-K int8",
          lambda x: flash_attention_packed_int8(x, x, x, H, scale), qp, args.iters)

    if args.sweep:
        # block_q sweep: the target also sets the Nq pad multiple, so each
        # candidate pads 4250 → its own multiple (128→4352, 256→4352,
        # 512→4608, 1024→5120 — bigger blocks buy fewer grid steps at the
        # cost of up to 20% padded rows). Measured 3.71 ms/site bf16 vs a
        # 3.17 ms padded-MXU floor; this finds whether blocking closes it.
        from prompt_diffusion_tpu.ops.flash_attention import _packed_forward

        print("\nblock_q sweep (bf16 packed full-K):", flush=True)
        for tgt in (128, 256, 512, 1024):
            try:
                timed(f"  bf16 block_q_target={tgt}",
                      lambda x, t=tgt: _packed_forward(x, x, x, H, scale, t),
                      qp, args.iters)
            except Exception as e:  # VMEM OOM at big blocks — keep sweeping
                print(f"  bf16 block_q_target={tgt}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        print("block_q sweep (int8 packed full-K):", flush=True)
        for tgt in (128, 256, 512, 1024):
            try:
                timed(f"  int8 block_q_target={tgt}",
                      lambda x, t=tgt: flash_attention_packed_int8(
                          x, x, x, H, scale, block_q_target=t),
                      qp, args.iters)
            except Exception as e:
                print(f"  int8 block_q_target={tgt}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

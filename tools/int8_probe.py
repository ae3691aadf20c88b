"""Is int8 worth it on this chip? (dev tool)

Measures bf16 vs int8 MXU throughput on the bench's actual hot shapes:
the 64² 3×3 convs (320ch) and the GEGLU FF matmuls. v5e datasheet says
394 TOPS int8 vs 197 TFLOP/s bf16 — this verifies XLA actually lowers
int8 convolutions/dots to the fast path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, label, flops, trips):
    fj = jax.jit(fn)
    jax.block_until_ready(fj(*args))
    best = 1e9
    for i in range(1, 4):
        # perturb the first arg — identical (program, inputs) executions are
        # served from a cache on this runtime
        a0 = args[0]
        bump = jnp.ones((), a0.dtype) * jnp.asarray(i, a0.dtype) if a0.dtype != jnp.int8 \
            else jnp.int8(i)
        pert = (a0 + bump,) + tuple(args[1:])
        jax.block_until_ready(pert)
        t0 = time.perf_counter()
        float(jnp.asarray(fj(*pert), jnp.float32))
        best = min(best, time.perf_counter() - t0)
    # flops is the TOTAL over all trips; best is the TOTAL wall (incl. one
    # ~28 ms tunnel RTT — use trips large enough that compute dominates)
    per = best / trips
    print(f"{label}: {per * 1e3:.3f} ms/op  {flops / best / 1e12:.1f} T(FL)OP/s")
    return per


def main():
    n = 1000  # one scan iteration is ~0.4-2 ms; the tunnel RTT is ~28 ms —
    # n must be large enough that compute dominates the readback latency
    B, H, W, C = 8, 64, 64, 320

    # --- 3x3 conv, 320ch (in_conv shape) ---------------------------------
    xb = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
    wb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(xb.shape, wb.shape, ("NHWC", "HWIO", "NHWC"))
    flops = 2 * B * H * W * C * C * 9 * n

    # every body must chain the NEXT input through the PREVIOUS output —
    # i-based perturbation only cycles a couple of distinct inputs and this
    # runtime serves identical (op, inputs) executions from a cache
    # (observed: "641 TF/s bf16 conv", 4.6x over the physically achievable)
    def conv_bf16(x, w):
        def body(xc, _):
            o = jax.lax.conv_general_dilated(xc, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
            return (xc + 1e-6 * o).astype(xc.dtype), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.float32))

    timed(conv_bf16, (xb, wb), "conv3x3 320ch bf16", flops, n)

    xi = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 20).astype(jnp.int8)
    wi = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C)) * 20).astype(jnp.int8)

    def conv_int8(x, w):
        def body(xc, _):
            o = jax.lax.conv_general_dilated(
                xc, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return xc + (o & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))

    timed(conv_int8, (xi, wi), "conv3x3 320ch int8", flops, n)

    # --- decomposed int8 convs: do int8 DOTS beat the int8 conv lowering? --
    def conv9_int8(x, w):
        """3×3 SAME conv as 9 shifted (BHW,C)@(C,C) int8 dots, int32 accum."""
        def one(xp):
            acc = None
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    xs = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))[
                        :, dy:dy + H, dx:dx + W, :]
                    o = jax.lax.dot_general(
                        xs.reshape(B * H * W, C), w[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = o if acc is None else acc + o
            return acc

        def body(xc, _):
            o = one(xc).reshape(B, H, W, C)
            return xc + (o & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))

    timed(conv9_int8, (xi, wi), "conv3x3 as 9 int8 dots", flops, n)

    def conv_im2col_int8(x, w):
        """3×3 SAME conv as ONE (BHW, 9C)@(9C, C) int8 dot."""
        wf = w.reshape(9 * C, C)

        def one(xp):
            p = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [p[:, dy:dy + H, dx:dx + W, :]
                 for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=-1)
            return jax.lax.dot_general(
                cols.reshape(B * H * W, 9 * C), wf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def body(xc, _):
            o = one(xc).reshape(B, H, W, C)
            return xc + (o & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))

    timed(conv_im2col_int8, (xi, wi), "conv3x3 im2col int8 dot", flops, n)

    # --- Pallas int8 conv kernel (ops/int8_conv.py) -----------------------
    from prompt_diffusion_tpu.ops.int8_conv import conv3x3_int8

    sa = jnp.ones((B,), jnp.float32)
    sw = jnp.ones((C,), jnp.float32)
    wi4 = jnp.asarray(
        (np.random.default_rng(2).normal(size=(3, 3, C, C)) * 20), jnp.int8)

    def conv_pallas_int8(x, w):
        def body(xc, _):
            o = conv3x3_int8(xc, sa, w, sw, None, out_dtype=jnp.float32)
            return xc + (jnp.round(o).astype(jnp.int32) & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))

    timed(conv_pallas_int8, (xi, wi4), "conv3x3 PALLAS int8", flops, n)

    def conv_pallas_int8_xshift(x, w):
        def body(xc, _):
            o = conv3x3_int8(xc, sa, w, sw, None, out_dtype=jnp.float32,
                             variant="xshift")
            return xc + (jnp.round(o).astype(jnp.int32) & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, x, jnp.arange(n))[0].astype(jnp.int32))

    # in-kernel im2col: kills the 3x HBM x3 traffic that makes the 64^2
    # site the only one below bf16 (see ops/int8_conv.py variant notes)
    timed(conv_pallas_int8_xshift, (xi, wi4), "conv3x3 PALLAS int8 XSHIFT",
          flops, n)

    # deeper-level hot shapes
    for (hh, cc) in [(32, 640), (16, 1280)]:
        xi2 = (np.random.default_rng(3).normal(size=(B, hh, hh, cc)) * 20).astype(np.int8)
        wi2 = (np.random.default_rng(4).normal(size=(3, 3, cc, cc)) * 20).astype(np.int8)
        xi2, wi2 = jnp.asarray(xi2), jnp.asarray(wi2)
        sa2, sw2 = jnp.ones((B,), jnp.float32), jnp.ones((cc,), jnp.float32)
        fl2 = 2 * B * hh * hh * cc * cc * 9 * n

        def conv_pallas_int8_l(x, w, _sa=sa2, _sw=sw2, _n=n):
            def body(xc, _):
                o = conv3x3_int8(xc, _sa, w, _sw, None, out_dtype=jnp.float32)
                return xc + (jnp.round(o).astype(jnp.int32) & 1).astype(jnp.int8), None
            return jnp.sum(jax.lax.scan(body, x, jnp.arange(_n))[0].astype(jnp.int32))

        xb2 = jax.random.normal(jax.random.PRNGKey(7), (B, hh, hh, cc), jnp.bfloat16)
        wb2 = jax.random.normal(jax.random.PRNGKey(8), (3, 3, cc, cc), jnp.bfloat16)
        dn2 = jax.lax.conv_dimension_numbers(xb2.shape, wb2.shape, ("NHWC", "HWIO", "NHWC"))

        def conv_bf16_l(x, w, _dn=dn2, _n=n):
            def body(xc, _):
                o = jax.lax.conv_general_dilated(xc, w, (1, 1), "SAME",
                                                 dimension_numbers=_dn)
                return (xc + 1e-6 * o).astype(xc.dtype), None
            return jnp.sum(jax.lax.scan(body, x, jnp.arange(_n))[0].astype(jnp.float32))

        timed(conv_bf16_l, (xb2, wb2), f"conv3x3 {hh}^2 {cc}ch bf16", fl2, n)
        timed(conv_pallas_int8_l, (xi2, wi2), f"conv3x3 {hh}^2 {cc}ch PALLAS int8", fl2, n)

        def conv_pallas_int8_xs_l(x, w, _sa=sa2, _sw=sw2, _n=n):
            def body(xc, _):
                o = conv3x3_int8(xc, _sa, w, _sw, None, out_dtype=jnp.float32,
                                 variant="xshift")
                return xc + (jnp.round(o).astype(jnp.int32) & 1).astype(jnp.int8), None
            return jnp.sum(jax.lax.scan(body, x, jnp.arange(_n))[0].astype(jnp.int32))

        timed(conv_pallas_int8_xs_l, (xi2, wi2),
              f"conv3x3 {hh}^2 {cc}ch PALLAS int8 XSHIFT", fl2, n)

    # --- GEGLU FF dot: (B*N, 320) @ (320, 2560) --------------------------
    M, K, N2 = B * H * W, C, 2560
    a = jax.random.normal(jax.random.PRNGKey(2), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(3), (K, N2), jnp.bfloat16)
    dflops = 2 * M * K * N2 * n

    def dot_bf16(a, b):
        def body(ac, _):
            o = jnp.dot(ac, b)
            # chain must CONSUME every output column — feeding back a slice
            # lets XLA dead-code-eliminate the unsliced columns of the dot
            r = jnp.sum(o.astype(jnp.float32), axis=-1, keepdims=True)
            return (ac + 1e-6 * r).astype(ac.dtype), None
        return jnp.sum(jax.lax.scan(body, a, jnp.arange(n))[0].astype(jnp.float32))

    timed(dot_bf16, (a, b), "dense 320->2560 bf16", dflops, n)

    ai = (np.random.default_rng(0).normal(size=(M, K)) * 20).astype(np.int8)
    bi = (np.random.default_rng(1).normal(size=(K, N2)) * 20).astype(np.int8)
    ai, bi = jnp.asarray(ai), jnp.asarray(bi)

    def dot_int8(a, b):
        def body(ac, _):
            o = jax.lax.dot_general(ac, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            r = jnp.sum(o, axis=-1, keepdims=True)  # consume ALL columns
            return ac + (r & 1).astype(jnp.int8), None
        return jnp.sum(jax.lax.scan(body, a, jnp.arange(n))[0].astype(jnp.int32))

    timed(dot_int8, (ai, bi), "dense 320->2560 int8", dflops, n)

    # --- K=4096 self-attn-like dot (D=40 padded vs int8) ------------------
    q = jax.random.normal(jax.random.PRNGKey(4), (B * 8, 4096, 40), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(5), (B * 8, 4096, 40), jnp.bfloat16)
    aflops = 2 * (B * 8) * 4096 * 4096 * 40 * n

    def qk_bf16(q, k):
        def body(qc, _):
            o = jax.lax.dot_general(qc, k, (((2,), (2,)), ((0,), (0,))))
            r = jnp.sum(o.astype(jnp.float32), axis=-1, keepdims=True)
            return (qc + 1e-6 * r).astype(qc.dtype), None
        return jnp.sum(jax.lax.scan(body, q, jnp.arange(n))[0].astype(jnp.float32))

    timed(qk_bf16, (q, k), "qk^T D=40 bf16", aflops, n)


if __name__ == "__main__":
    main()

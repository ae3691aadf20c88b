"""Blockwise (flash) attention Pallas kernel for TPU.

TPU replacement for the reference's xformers `memory_efficient_attention`
(ldm/modules/attention.py:197-243) and its sliced-attention monkey-patch
(cldm/hack.py:72-111): one online-softmax kernel covers both.

Design:
  * Grid over (batch, heads, q-blocks). Each program holds one q block in
    VMEM and streams K/V in `block_k` chunks with a running max/sum-exp
    (online softmax), so the Nq×Nk logits matrix never materializes in HBM.
  * Logits and the accumulator are fp32 (matches the reference's forced
    fp32 softmax); QKᵀ and PV run on the MXU via `preferred_element_type`.
  * At Prompt-Diffusion scales (Nk ≤ 4096, D ≤ 160) a full K/V slice for
    one (b, h) fits comfortably in VMEM (~2.6 MB bf16), so K/V block specs
    load the whole sequence once per program and the inner loop is pure
    VMEM traffic.
  * Backward: custom_vjp that recomputes attention with the XLA einsum
    path and differentiates that — correct and simple; a fused backward
    kernel is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    # inputs stay in their storage dtype (bf16 on the fast path): the MXU
    # multiplies bf16 and ACCUMULATES in fp32 via preferred_element_type —
    # the same numerics guarantee as the reference's fp32 softmax, at 1×
    # MXU cost instead of the ~6 passes an fp32×fp32 matmul needs.
    q = q_ref[0, 0]  # (block_q, D)
    block_q, d = q.shape
    nk = k_ref.shape[2]
    num_kb = nk // block_k

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]  # (block_k, D)
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (block_q, block_k) fp32
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # fp32 softmax numerator
        correction = jnp.exp(m_i - m_new)
        l_new = l_i * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l_i).astype(o_ref.dtype)


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is ≤ target and a multiple of 128 if possible."""
    for cand in (target, 1024, 512, 256, 128):
        if cand <= target and n % cand == 0:
            return cand
    return n  # small or odd n: single block


def _flash_forward(q, k, v, scale):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # (B, N, H, D) -> (B, H, N, D) for sequence-major blocking
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    # Query rows are independent: pad Nq up to a friendly block multiple
    # and slice the extra rows off after. Without this, sequence lengths
    # with no power-of-two divisor (SD3 joint attention: 4096+154=4250)
    # degenerate to ONE whole-sequence q block whose (Nq, Nk) fp32 logits
    # (~72 MB) blow past VMEM.
    nq_pad = (-nq) % 512 if nq >= 512 else 0
    if nq_pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad), (0, 0)))
    nqp = nq + nq_pad
    block_q = _pick_block(nqp, 512)
    block_k = _pick_block(nk, 512)

    grid = (b, h, nqp // block_q)
    # CPU (tests, virtual meshes) runs the kernel in interpreter mode.
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, qb: (i, j, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), lambda i, j, qb: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), lambda i, j, qb: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda i, j, qb: (i, j, qb, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nqp * nk * d,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize * 2,
            transcendentals=b * h * nqp * nk,
        ),
        compiler_params=pltpu.CompilerParams(
            # full-K/V residency at D=512 (VAE mid-attention) exceeds the
            # 16 MB default scoped-vmem limit at batch ≥16
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    if nq_pad:
        out = out[:, :, :nq]
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    # Differentiate the (numerically equivalent) XLA path. Recompute is the
    # standard flash-attention trade: no Nq×Nk tensor was saved in fwd.
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over (B, N, H, D) tensors. No mask support — masked
    or tiny-sequence cases belong on the XLA einsum path."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention(q, k, v, float(scale))


# ---------------------------------------------------------------------------
# packed-heads variant: (B, N, H·D) in/out — no transposes
# ---------------------------------------------------------------------------
#
# The BNHD path costs four (B,N,H,D)↔(B,H,N,D) layout copies per attention
# site (~11 ms/step of `copy` fusions in the 512² UNet trace). This kernel
# consumes the projection output directly: heads are column slices of the
# packed H·D axis, processed in an unrolled loop inside one program while
# the q/k/v blocks stay VMEM-resident.

def _fa_packed_fullk_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                            num_heads: int):
    """Full-K variant: the whole K/V slice for one batch element is VMEM
    resident anyway at PD sequence lengths, so skip the online-softmax
    correction entirely — one QKᵀ per (q-block, head), one row softmax, one
    PV. Measured 25% faster than the online kernel at the D=40 hot shape
    (the correction's extra VPU passes over the logits block were the
    cost, tools/attn_variants.py)."""
    q = q_ref[0]  # (block_q, H*D)
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d]
        kh = k_ref[0, :, h * d : (h + 1) * d]
        vh = v_ref[0, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, Nk) fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


def _fa_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      num_heads: int, block_k: int):
    q = q_ref[0]  # (block_q, H*D)
    nk = k_ref.shape[1]
    d = q.shape[-1] // num_heads
    num_kb = nk // block_k

    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d]

        def body(kb, carry):
            acc, m_i, l_i = carry
            kh = k_ref[0, pl.ds(kb * block_k, block_k), h * d : (h + 1) * d]
            vh = v_ref[0, pl.ds(kb * block_k, block_k), h * d : (h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_i - m_new)
            l_new = l_i * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
        m0 = jnp.full((q.shape[0], 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc, _, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
        o_ref[0, :, h * d : (h + 1) * d] = (acc / l_i).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_packed(q, k, v, num_heads, scale):
    return _packed_forward(q, k, v, num_heads, scale)


def _packed_forward(q, k, v, num_heads, scale, block_q_target: int = 256):
    """block_q_target also sets the Nq pad multiple, so the target is always
    reachable (default 256 = the shipped config; tools/attn_sd3_probe.py
    sweeps it at the SD3 joint shape)."""
    b, nq, hd = q.shape
    nk = k.shape[1]
    interpret = jax.default_backend() == "cpu"
    # pad Nq to a block multiple (rows independent; see _flash_forward)
    nq_pad = (-nq) % block_q_target if nq >= block_q_target else 0
    if nq_pad:
        q = jnp.pad(q, ((0, 0), (0, nq_pad), (0, 0)))
    nqp = nq + nq_pad
    # full-K path whenever the per-head (block_q, Nk) fp32 logits row fits
    # VMEM comfortably (always true at PD scales: Nk ≤ 4096)
    if nk <= 8192:
        block_q = _pick_block(nqp, block_q_target)
        kernel = functools.partial(
            _fa_packed_fullk_kernel, scale=scale, num_heads=num_heads
        )
    else:
        block_q = _pick_block(nqp, 512)
        kernel = functools.partial(
            _fa_packed_kernel, scale=scale, num_heads=num_heads,
            block_k=_pick_block(nk, 512),
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nqp, hd), q.dtype),
        grid=(b, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, qb: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, qb: (i, qb, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq] if nq_pad else out


def _packed_ref(q, k, v, num_heads, scale):
    b, nq, hd = q.shape
    d = hd // num_heads
    qs = q.reshape(b, nq, num_heads, d)
    ks = k.reshape(b, k.shape[1], num_heads, d)
    vs = v.reshape(b, v.shape[1], num_heads, d)
    return _xla_attention(qs, ks, vs, scale).reshape(b, nq, hd)


def _packed_fwd(q, k, v, num_heads, scale):
    return _packed_forward(q, k, v, num_heads, scale), (q, k, v)


def _packed_bwd(num_heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _packed_ref(q_, k_, v_, num_heads, scale), q, k, v)
    return vjp(g)


_flash_packed.defvjp(_packed_fwd, _packed_bwd)


def flash_attention_packed(q, k, v, num_heads: int, scale: Optional[float] = None):
    """Flash attention over packed (B, N, H·D) tensors — the projection
    layout — avoiding all head transposes."""
    if scale is None:
        scale = (q.shape[-1] // num_heads) ** -0.5
    return _flash_packed(q, k, v, num_heads, float(scale))


# ---------------------------------------------------------------------------
# int8 QKᵀ/PV variant (serving mode): int8 MXU dots, fp32 softmax
# ---------------------------------------------------------------------------
#
# The int8 serving mode quantizes the dense/conv sites but round 2 left
# attention bf16 ("int8 attention" lever, docs/ROADMAP.md). This is the
# lab's winning variant (tools/attn_int8_lab.py "v3"; at the SD3 joint
# shape B2 N4250 H24 D64: 4.52 ms/site vs 4.99 bf16 vs 5.04 for the
# round-3 v1 kernel that also int8-quantized P·V, rel-err 0.51% vs 1.0%):
#   * K is quantized ONCE per site outside the kernel with a per-HEAD
#     scalar scale — it folds into the softmax `scale` multiplier, so the
#     logits dequant is ONE fused column-broadcast multiply instead of a
#     row-vector × column-vector pair of N² VPU passes.
#   * Q is quantized per-row inside the kernel while the q-block is
#     VMEM-resident (each row's scale multiplies a logits row).
#   * logits = (q_i8 · k_i8ᵀ)_int32 · sq_row · (sk_head · scale), softmax
#     in fp32 (reference semantics).
#   * P·V stays bf16: dropping the P-requant + V-quant saves ~3 N² VPU
#     passes, worth more than the int8 MXU rate on the (N, D) dot.
# Inference-only: no VJP (the serving mode never trains).

def _fa_packed_fullk_int8_kernel(q_ref, k_ref, skh_ref, v_ref, o_ref, *,
                                 scale: float, num_heads: int):
    q = q_ref[0]  # (block_q, H*D) storage dtype
    d = q.shape[-1] // num_heads
    for h in range(num_heads):
        qh = q[:, h * d : (h + 1) * d].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1, keepdims=True) / 127.0, 1e-8)
        qi = jnp.clip(jnp.round(qh / sq), -127, 127).astype(jnp.int8)
        ki = k_ref[0, :, h * d : (h + 1) * d]  # (Nk, D) int8
        s32 = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # (block_q, Nk)
        s = s32.astype(jnp.float32) * (sq * (skh_ref[0, 0, h] * scale))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        vh = v_ref[0, :, h * d : (h + 1) * d]  # (Nk, D) storage dtype
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, D)
        o_ref[0, :, h * d : (h + 1) * d] = (o / l).astype(o_ref.dtype)


def flash_attention_packed_int8(q, k, v, num_heads: int,
                                scale: Optional[float] = None,
                                block_q_target: int = 256):
    """int8-QKᵀ attention over packed (B, N, H·D) tensors (serving mode).

    K: per-head scalar scales (folded into the softmax scale); Q: per-row
    scales computed in-kernel; P·V in bf16; fp32 softmax. Falls back to
    the bf16 kernel on CPU."""
    if scale is None:
        scale = (q.shape[-1] // num_heads) ** -0.5
    if jax.default_backend() == "cpu":
        return flash_attention_packed(q, k, v, num_heads, scale)
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // num_heads

    kf = k.astype(jnp.float32).reshape(b, nk, num_heads, d)
    skh = jnp.maximum(jnp.max(jnp.abs(kf), axis=(1, 3)) / 127.0, 1e-8)  # (B, H)
    ki = jnp.clip(jnp.round(kf / skh[:, None, :, None]), -127, 127).astype(jnp.int8)
    ki = ki.reshape(b, nk, hd)
    skh = skh[:, None, :]  # (B, 1, H): TPU blocks match the last TWO dims

    nq_pad = (-nq) % block_q_target if nq >= block_q_target else 0
    if nq_pad:
        q = jnp.pad(q, ((0, 0), (0, nq_pad), (0, 0)))
    nqp = nq + nq_pad
    block_q = _pick_block(nqp, block_q_target)
    out = pl.pallas_call(
        functools.partial(
            _fa_packed_fullk_int8_kernel, scale=float(scale), num_heads=num_heads),
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
    )(q, ki, skh, v)
    return out[:, :nq] if nq_pad else out

"""Fused AdaLN (→ optional int8) Pallas kernel for the SD3 MMDiT.

Every JointBlock carries 4 AdaLN modulation sites per stream
(norm1 / norm2 × hidden / context): LN(no-affine) → ×(1+scale) + shift
with PER-SAMPLE (B,1,C) modulation vectors from the conditioning
embedding. In the int8 serving mode these feed QuantDense projections, so
round 2's per-tensor dynamic quantization cost an extra amax pass + HBM
round-trip per site ("AdaLN+quant epilogue" lever, docs/ROADMAP.md).

This kernel does stats + modulate (+ int8 quantize with per-ROW scales)
in ONE VMEM-resident pass:

  fused_adaln(x, scale, shift)        → bf16 modulated activation
  fused_adaln_quant(x, scale, shift)  → (int8 activation, (B,N,1) fp32
                                          row scales) for QuantDense

Inference-only (the int8 path is a serving mode); the bf16 variant has a
recompute-VJP like ops/fused_layer_norm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _jnp_adaln(x, scale, shift, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    return h


def _adaln_kernel(x_ref, s_ref, t_ref, o_ref, *, eps):
    x = x_ref[0]  # (rb, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + s_ref[0, 0][None, :].astype(jnp.float32)) \
        + t_ref[0, 0][None, :].astype(jnp.float32)
    o_ref[0] = h.astype(o_ref.dtype)


def _adaln_quant_kernel(x_ref, s_ref, t_ref, oq_ref, os_ref, *, eps):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + s_ref[0, 0][None, :].astype(jnp.float32)) \
        + t_ref[0, 0][None, :].astype(jnp.float32)
    oq, s_a = rowquant(h)
    oq_ref[0] = oq
    os_ref[0] = s_a  # (rb, 1)


# Blocking: rows are padded up to a multiple of 8 (SD3's context stream is
# N=154 or 333 — no multiple-of-8 divisor exists unpadded, and falling back
# to the jnp path there would reintroduce the amax pass + HBM round-trip
# this kernel exists to kill), then blocked with the shared picker.
from prompt_diffusion_tpu.ops.fused_layer_norm import row_block8, rowquant

# Test hook: when True, the Pallas path runs in interpret mode even on CPU
# (exercises the row-padding/grid logic without a TPU).
_FORCE_INTERPRET = False


def _pad_rows(x, n):
    n_pad = (-n) % 8
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
    return x, n + n_pad


def _prep(x, scale, shift):
    """Normalize shapes to x (B,N,C), scale/shift (B,C)."""
    if x.ndim != 3:
        raise ValueError(f"fused_adaln expects (B,N,C), got {x.shape}")
    b, n, c = x.shape
    # (b, 1, c): Pallas TPU block shapes must match (or tile by 8/128) the
    # last two array dims — a (1, c) block over a (b, c) array is rejected
    s2 = scale.reshape(b, 1, c)
    t2 = shift.reshape(b, 1, c)
    return b, n, c, s2, t2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_adaln(x, scale, shift, eps: float = 1e-6):
    """x (B,N,C); scale/shift (B,1,C) or (B,C). LN(no affine) then
    per-sample modulation; bf16 out."""
    return _forward(x, scale, shift, eps)


def _forward(x, scale, shift, eps):
    b, n, c, s2, t2 = _prep(x, scale, shift)
    if jax.default_backend() == "cpu" and not _FORCE_INTERPRET:
        return _jnp_adaln(x, scale.reshape(b, 1, c), shift.reshape(b, 1, c), eps).astype(x.dtype)
    xp, np8 = _pad_rows(x, n)
    rb = row_block8(np8, c, x.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_adaln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, np8, c), x.dtype),
        grid=(b, np8 // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_FORCE_INTERPRET,
    )(xp, s2, t2)
    return out[:, :n] if np8 != n else out


def _fwd(x, scale, shift, eps):
    return _forward(x, scale, shift, eps), (x, scale, shift)


def _bwd(eps, res, g):
    x, scale, shift = res
    b, _, c = x.shape
    _, vjp = jax.vjp(
        lambda x_, s_, t_: _jnp_adaln(
            x_, s_.reshape(b, 1, c), t_.reshape(b, 1, c), eps).astype(x_.dtype),
        x, scale, shift)
    return vjp(g)


fused_adaln.defvjp(_fwd, _bwd)


def fused_adaln_quant(x, scale, shift, eps: float = 1e-6):
    """→ (int8 (B,N,C), fp32 row scales (B,N,1)) for tuple-aware
    QuantDense. Inference-only."""
    b, n, c, s2, t2 = _prep(x, scale, shift)
    if jax.default_backend() == "cpu" and not _FORCE_INTERPRET:
        h = _jnp_adaln(x, scale.reshape(b, 1, c), shift.reshape(b, 1, c), eps)
        return rowquant(h)
    xp, np8 = _pad_rows(x, n)
    rb = row_block8(np8, c, x.dtype.itemsize)
    oq, s_a = pl.pallas_call(
        functools.partial(_adaln_quant_kernel, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((b, np8, c), jnp.int8),
            jax.ShapeDtypeStruct((b, np8, 1), jnp.float32),
        ],
        grid=(b, np8 // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, 1), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_FORCE_INTERPRET,
    )(xp, s2, t2)
    if np8 != n:
        oq, s_a = oq[:, :n], s_a[:, :n]
    return oq, s_a

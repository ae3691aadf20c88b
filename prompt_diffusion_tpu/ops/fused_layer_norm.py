"""Fused LayerNorm Pallas kernel (fp32 stats, bf16 I/O).

The UNet's transformer blocks carry 3 pre-LNs per BasicTransformerBlock
(~48 sites per ε-step). XLA lowers each fp32-stat LayerNorm into a
convert → reduce(mean) → reduce(var) → normalize chain: ≥3 HBM reads +
1 write of the activation. This kernel keeps the row block VMEM-resident
and does stats + normalize + affine in ONE pass: 1 read + 1 write
(measured ~6.5 ms/step of LN stat-reduction fusions in the 512² trace).

Replaces flax nn.LayerNorm at the hot sites via `FusedLayerNorm`, which
keeps the identical param tree ("scale", "bias") so checkpoint
import/export is unaffected.

Backward recomputes through the jnp reference (same trade as the
flash-attention and GroupNorm kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rowquant(h):
    """fp32 (..., C) → (int8, (..., 1) fp32 scales): symmetric per-row
    int8 quantization — the ONE quant epilogue shared by every fused
    kernel (LN / AdaLN / GELU / GEGLU row variants). A change to the
    clamp epsilon or clip range happens here and nowhere else."""
    s_a = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, 1e-8)
    return jnp.clip(jnp.round(h / s_a), -127, 127).astype(jnp.int8), s_a


def _jnp_layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...]  # (rb, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _row_block(n, c, itemsize, budget=2 * 1024 * 1024):
    """Largest row block dividing n within the VMEM budget. Mosaic requires
    the block's row count be a multiple of 8 OR the whole array, so when
    n % 8 == 0 step in 8s (a divisor of n that is merely odd — e.g. 1025
    rows of a 16·1025-token ViT batch — would be rejected); odd n falls
    back to the whole-array block (callers gate sizes via *_auto)."""
    rb = max(1, min(n, budget // (c * itemsize)))
    if n % 8 == 0:
        rb = max(8, rb // 8 * 8)
        while n % rb or rb % 8:
            rb -= 8
        return max(rb, 8)
    while n % rb:
        rb -= 1
    return rb if rb == n or rb % 8 == 0 else n


def row_block8(n, c, itemsize, budget=2 * 1024 * 1024):
    """Largest multiple-of-8 row block dividing n (requires n % 8 == 0).

    The (rb, 1) scale-output tiles of the quant kernels need rb % 8 == 0,
    so callers pad their row count up to a multiple of 8 first; stepping
    DOWN in multiples of 8 then always terminates at a valid block.
    Shared by fused_layer_norm_quant and ops/fused_adaln (keep the two
    kernels' blocking in lockstep)."""
    if n % 8:
        raise ValueError(f"row_block8 needs n % 8 == 0, got {n}")
    rb = max(8, min(n, budget // (c * itemsize)) // 8 * 8)
    while n % rb:
        rb -= 8
    return rb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5):
    """x (..., N, C) → LayerNorm over the last axis."""
    return _forward(x, scale, bias, eps)


def _forward(x, scale, bias, eps):
    orig_shape = x.shape
    c = orig_shape[-1]
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    x2 = x.reshape(n, c)
    interpret = jax.default_backend() == "cpu"
    rb = _row_block(n, c, x.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(orig_shape)


def _fwd(x, scale, bias, eps):
    return _forward(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _jnp_layer_norm(x_, s_, b_, eps),
                     x, scale, bias)
    return vjp(g)


fused_layer_norm.defvjp(_fwd, _bwd)


def _ln_quant_kernel(x_ref, scale_ref, bias_ref, oq_ref, os_ref, *, eps: float):
    """LN with an int8 epilogue: per-ROW (token) scales — finer than the
    per-tensor dynamic quantization it replaces, and free while the rows
    are VMEM-resident."""
    x = x_ref[...]  # (rb, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    oq, s_a = rowquant(out)
    oq_ref[...] = oq
    os_ref[...] = s_a  # (rb, 1)


def fused_layer_norm_quant(x, scale, bias, eps: float = 1e-5):
    """LayerNorm → (int8 activation, per-row fp32 scale (..., N, 1)).
    Inference-only; consumed by QuantDense as a pre-quantized pair."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    if jax.default_backend() == "cpu":
        out = _jnp_layer_norm(x, scale, bias, eps).astype(jnp.float32)
        return rowquant(out)
    x2 = x.reshape(n, c)
    # the (rb, 1) scale output tiles need rb % 8 == 0; pad the row count up
    # to a multiple of 8 so such an rb always exists, then step rb DOWN in
    # multiples of 8 until it divides the padded count (never landing on a
    # non-multiple-of-8 divisor)
    n_pad = (-n) % 8
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
    np8 = n + n_pad
    rb = row_block8(np8, c, x.dtype.itemsize)
    oq, s_a = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((np8, c), jnp.int8),
            jax.ShapeDtypeStruct((np8, 1), jnp.float32),
        ],
        grid=(np8 // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=False,
    )(x2, scale, bias)
    if n_pad:
        oq, s_a = oq[:n], s_a[:n]
    return oq.reshape(orig_shape), s_a.reshape(orig_shape[:-1] + (1,))


def layer_norm_auto(x, scale, bias, eps=1e-5, min_fused_elems: int = 1 << 16):
    """Kernel on TPU for non-trivial sizes, jnp elsewhere."""
    c = x.shape[-1]
    total = 1
    for d in x.shape:
        total *= d
    n = total // c
    row_bytes = c * x.dtype.itemsize
    fits = (n % 8 == 0) or (n * row_bytes <= 32 * 1024 * 1024)
    if (total >= min_fused_elems and c >= 128 and fits
            and jax.default_backend() != "cpu"):
        return fused_layer_norm(x, scale, bias, eps)
    return _jnp_layer_norm(x, scale, bias, eps)

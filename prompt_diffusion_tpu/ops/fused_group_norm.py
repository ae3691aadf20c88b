"""Fused GroupNorm(+SiLU) Pallas kernel.

XLA lowers the fp32-stat GroupNorm (ops/norms.py) into a convert →
reduce → broadcast-normalize chain that walks the activation through HBM
several times (~18 ms/step of convert_reduce fusions in the 512² UNet
trace). This kernel does the whole thing in ONE pass per batch row:
activation block lives in VMEM, stats accumulate in fp32, normalize +
affine + SiLU write back bf16.

Shapes: (B, H, W, C) with groups dividing C; the largest UNet GN input at
512² is (B, 64, 64, 320) ≈ 2.6 MB bf16 per batch row — comfortably VMEM
resident, so the grid is just (B,).

Backward: custom_vjp recomputing through the jnp reference implementation
(same trade as the flash-attention kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prompt_diffusion_tpu.ops.norms import group_norm as _jnp_group_norm


def _gn_kernel(x_ref, scale_ref, bias_ref, avg_ref, o_ref, *, eps: float,
               apply_silu: bool, apply_relu: bool = False):
    """Group stats via a (C, C) block-diagonal averaging matmul — Mosaic
    supports 2D collapses + MXU dots, not the (HW, G, C/G) reshape."""
    x = x_ref[0]  # (H, W, C)
    h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(h * w, c)
    # per-channel moments over pixels
    ch_mean = jnp.mean(xf, axis=0, keepdims=True)  # (1, C)
    ch_sq = jnp.mean(jnp.square(xf), axis=0, keepdims=True)
    # broadcast group-average to channels: (1,C) @ (C,C) block-diag avg
    avg = avg_ref[:]
    g_mean = jnp.dot(ch_mean, avg, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(ch_sq, avg, preferred_element_type=jnp.float32)
    var = g_sq - jnp.square(g_mean)
    inv = jax.lax.rsqrt(var + eps)
    scale = scale_ref[:].astype(jnp.float32) * inv
    shift = bias_ref[:].astype(jnp.float32) - g_mean * scale
    out = xf * scale + shift
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    elif apply_relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.reshape(h, w, c).astype(o_ref.dtype)


def _gn_quant_kernel(x_ref, scale_ref, bias_ref, avg_ref, oq_ref, os_ref, *,
                     eps: float, apply_silu: bool):
    """GN(+SiLU) with an int8 epilogue: while the normalized activation is
    still VMEM-resident, compute the per-sample amax and emit int8 + scale.
    This is the 'fused quantization' path that makes W8A8 pay — the
    standalone dynamic quantization costs an extra amax pass + round/clip
    pass per site (measured: standalone int8 is *slower* end-to-end on
    SD1.5, docs/ROADMAP.md)."""
    x = x_ref[0]  # (H, W, C)
    h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(h * w, c)
    ch_mean = jnp.mean(xf, axis=0, keepdims=True)
    ch_sq = jnp.mean(jnp.square(xf), axis=0, keepdims=True)
    avg = avg_ref[:]
    g_mean = jnp.dot(ch_mean, avg, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(ch_sq, avg, preferred_element_type=jnp.float32)
    var = g_sq - jnp.square(g_mean)
    inv = jax.lax.rsqrt(var + eps)
    scale = scale_ref[:].astype(jnp.float32) * inv
    shift = bias_ref[:].astype(jnp.float32) - g_mean * scale
    out = xf * scale + shift
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    s_a = jnp.maximum(jnp.max(jnp.abs(out)) / 127.0, 1e-8)
    oq = jnp.clip(jnp.round(out / s_a), -127, 127)
    oq_ref[0] = oq.reshape(h, w, c).astype(jnp.int8)
    # Mosaic requires full (8,128) output tiles — broadcast the scalar
    os_ref[0] = jnp.full((8, 128), s_a, jnp.float32)


def fused_group_norm_quant(x, scale, bias, num_groups: int, eps: float = 1e-5,
                           apply_silu: bool = False):
    """GroupNorm(+SiLU) → (int8 activation, per-sample fp32 scale (B,)).
    Inference-only (no VJP); row must fit one VMEM block. CPU falls back to
    jnp + explicit quantization (tests)."""
    b, h, w, c = x.shape
    # use the REAL itemsize (like _forward): a fp32 activation at a
    # 2-byte-accounted size between 4 and 8 MB would pass the gate but
    # double the actual VMEM block
    if (jax.default_backend() == "cpu"
            or h * w * c * x.dtype.itemsize > 8 * 1024 * 1024):
        out = _jnp_group_norm(x, num_groups, scale, bias, eps=eps,
                              apply_silu=apply_silu).astype(jnp.float32)
        amax = jnp.max(jnp.abs(out), axis=(1, 2, 3))
        s_a = jnp.maximum(amax / 127.0, 1e-8)
        oq = jnp.clip(jnp.round(out / s_a[:, None, None, None]), -127, 127)
        return oq.astype(jnp.int8), s_a
    avg = jnp.asarray(_group_avg_matrix(c, num_groups))
    oq, s_a = pl.pallas_call(
        functools.partial(_gn_quant_kernel, eps=eps, apply_silu=apply_silu),
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.int8),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ],
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )(x, scale, bias, avg)
    return oq, s_a[:, 0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5,
                     apply_silu: bool = False, apply_relu: bool = False):
    return _forward(x, scale, bias, num_groups, eps, apply_silu, apply_relu)


import numpy as np


@functools.lru_cache(maxsize=32)
def _group_avg_matrix(c: int, num_groups: int):
    cg = c // num_groups
    a = np.zeros((c, c), np.float32)
    for g in range(num_groups):
        a[g * cg : (g + 1) * cg, g * cg : (g + 1) * cg] = 1.0 / cg
    return a


def _stats_kernel(x_ref, o_ref):
    """Per-(batch, row-block) channel sum / sum-of-squares in fp32."""
    x = x_ref[0]  # (hb, W, C)
    hb, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(hb * w, c)
    o_ref[0, 0, 0] = jnp.sum(xf, axis=0)
    o_ref[0, 0, 1] = jnp.sum(xf * xf, axis=0)


def _apply_kernel(x_ref, sc_ref, sh_ref, o_ref, *, apply_silu: bool,
                  apply_relu: bool = False):
    x = x_ref[0].astype(jnp.float32)  # (hb, W, C)
    out = x * sc_ref[0, 0] + sh_ref[0, 0]
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    elif apply_relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _row_block(h, w, c, itemsize, budget=4 * 1024 * 1024):
    """Largest divisor of h whose (hb, w, c) block fits the VMEM budget."""
    per_row = w * c * itemsize
    hb = max(1, min(h, budget // per_row))
    while h % hb:
        hb -= 1
    return hb


def _forward_blocked(x, scale, bias, num_groups, eps, apply_silu,
                     apply_relu=False):
    """Two-pass row-blocked path for activations too large for one VMEM
    block (the 512²/256² VAE decoder GNs): stats stream + apply stream,
    2 reads + 1 write of the bf16 activation, no fp32 materialization and
    no (…, G, C/G) relayout."""
    b, h, w, c = x.shape
    interpret = jax.default_backend() == "cpu"
    hb = _row_block(h, w, c, x.dtype.itemsize)
    nb = h // hb
    partial = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, nb, 2, c), jnp.float32),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    tot = jnp.sum(partial, axis=1)  # (B, 2, C)
    n = h * w * (c // num_groups)
    g_sum = tot[:, 0].reshape(b, num_groups, c // num_groups).sum(-1)
    g_sq = tot[:, 1].reshape(b, num_groups, c // num_groups).sum(-1)
    g_mean = g_sum / n
    g_var = g_sq / n - jnp.square(g_mean)
    inv = jax.lax.rsqrt(g_var + eps)  # (B, G)
    cg = c // num_groups
    inv_c = jnp.repeat(inv, cg, axis=-1)  # (B, C)
    mean_c = jnp.repeat(g_mean, cg, axis=-1)
    eff_scale = scale.astype(jnp.float32)[None, :] * inv_c
    eff_shift = bias.astype(jnp.float32)[None, :] - mean_c * eff_scale
    return pl.pallas_call(
        functools.partial(_apply_kernel, apply_silu=apply_silu,
                          apply_relu=apply_relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, eff_scale[:, None, :], eff_shift[:, None, :])


def _forward(x, scale, bias, num_groups, eps, apply_silu, apply_relu=False):
    b, h, w, c = x.shape
    if h * w * c * x.dtype.itemsize > 8 * 1024 * 1024:
        return _forward_blocked(x, scale, bias, num_groups, eps, apply_silu,
                                apply_relu)
    interpret = jax.default_backend() == "cpu"
    avg = jnp.asarray(_group_avg_matrix(c, num_groups))
    return pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, apply_silu=apply_silu,
                          apply_relu=apply_relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, scale, bias, avg)


def _fwd(x, scale, bias, num_groups, eps, apply_silu, apply_relu):
    return (_forward(x, scale, bias, num_groups, eps, apply_silu, apply_relu),
            (x, scale, bias))


def _bwd(num_groups, eps, apply_silu, apply_relu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _jnp_group_norm(x_, num_groups, s_, b_, eps,
                                           apply_silu, apply_relu),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)


def group_norm_auto(x, num_groups, scale, bias, eps=1e-5, apply_silu=False,
                    apply_relu=False, min_fused_elems: int = 1 << 18):
    """Pick the Pallas kernel for large activations on TPU, jnp otherwise.
    Batch rows ≤ ~8 MB go through the single-pass VMEM-resident kernel;
    larger rows (512²/256² VAE decoder) through the row-blocked two-pass
    kernel."""
    b, h, w, c = x.shape if x.ndim == 4 else (1, 1, 1, x.shape[-1])
    if (
        x.ndim == 4
        and x.shape[0] * h * w * c >= min_fused_elems
        and c % num_groups == 0
        and jax.default_backend() != "cpu"
    ):
        return fused_group_norm(x, scale, bias, num_groups, eps, apply_silu,
                                apply_relu)
    return _jnp_group_norm(x, num_groups, scale, bias, eps=eps,
                           apply_silu=apply_silu, apply_relu=apply_relu)

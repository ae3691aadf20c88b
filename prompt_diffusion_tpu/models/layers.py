"""Shared Flax building blocks for the SD1.5 UNet / ControlNet / VAE.

Faithful re-expressions of the reference blocks
(ldm/modules/diffusionmodules/openaimodel.py, ldm/modules/attention.py)
in TPU-native form: NHWC layout, bf16 compute with fp32 norms/softmax,
`nn.remat` for gradient checkpointing instead of the custom autograd
CheckpointFunction (ldm/modules/diffusionmodules/util.py:102-151).

Parameter tree names deliberately mirror the torch module paths
(`in_layers_0`, `emb_layers_1`, …) so checkpoint import is a mechanical
key rewrite (see tools/torch_import.py).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.ops.attention import dot_product_attention
from prompt_diffusion_tpu.ops.norms import group_norm
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy

# Read ONCE at import: these toggles participate in tracing, and jit caches
# are keyed on traced structure, not the environment — reading them lazily
# would let a mid-process flip silently serve stale compiled programs.
# Flipping either requires a fresh process (measurement-only toggles).
_SD15_INT8_ATTN = bool(os.environ.get("PD_SD15_INT8_ATTN"))
# fused GEGLU→int8 epilogue (ops/fused_act.fused_geglu_quant): kills the
# standalone amax+quant HBM passes over the (B,N,4C) GEGLU output. ON by
# default since round 5: chip-measured 0.9984 vs 0.9665 img/s without it
# (+3.3%, docs/evidence/q4/sd15_geglu.log); set PD_SD15_FUSED_GEGLU=0 to
# fall back to the unfused path.
_SD15_FUSED_GEGLU = os.environ.get("PD_SD15_FUSED_GEGLU", "1") not in ("", "0")


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding, [cos | sin] order (util.py:154-174)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class FusedLayerNorm(nn.Module):
    """LayerNorm with fp32 statistics; param tree identical to
    nn.LayerNorm ("scale", "bias"). Routes through the one-pass Pallas
    kernel on TPU (ops/fused_layer_norm.py). `quant_out=True` (int8 mode,
    consumers are QuantDense) emits (int8, per-row scale) from the
    kernel's fused epilogue."""

    eps: float = 1e-5
    quant_out: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.quant_out:
            from prompt_diffusion_tpu.ops.fused_layer_norm import fused_layer_norm_quant

            return fused_layer_norm_quant(x, scale, bias, eps=self.eps)
        from prompt_diffusion_tpu.ops.fused_layer_norm import layer_norm_auto

        return layer_norm_auto(x, scale, bias, eps=self.eps)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics (GroupNorm32, util.py:217-219).

    `quant_out=True` (int8 serving mode, when the sole consumer is a
    QuantConv) emits `(int8 activation, per-sample scale)` from the GN
    kernel's fused epilogue — the activation is quantized while still
    VMEM-resident, so W8A8 costs no extra HBM passes."""

    num_groups: int = 32
    eps: float = 1e-5
    apply_silu: bool = False
    quant_out: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.quant_out:
            from prompt_diffusion_tpu.ops.fused_group_norm import fused_group_norm_quant

            return fused_group_norm_quant(
                x, scale, bias, self.num_groups, eps=self.eps,
                apply_silu=self.apply_silu)
        from prompt_diffusion_tpu.ops.fused_group_norm import group_norm_auto

        return group_norm_auto(
            x, self.num_groups, scale, bias, eps=self.eps, apply_silu=self.apply_silu
        )


def conv3x3(features: int, *, stride: int = 1, zero_init: bool = False, dtype=None,
            name=None, policy=None):
    """3×3 conv; `policy=` opts the site into the int8 serving path
    (param tree identical either way)."""
    if policy is not None and policy.quant == "int8":
        from prompt_diffusion_tpu.ops.quant import QuantConv

        return QuantConv(
            features, kernel_size=(3, 3), strides=(stride, stride), padding=1,
            zero_init=zero_init, out_dtype=policy.compute_dtype, name=name,
        )
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=1,
        kernel_init=init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1x1(features: int, *, zero_init: bool = False, dtype=None, name=None,
            policy=None):
    if policy is not None and policy.quant == "int8":
        from prompt_diffusion_tpu.ops.quant import QuantConv

        return QuantConv(
            features, kernel_size=(1, 1), zero_init=zero_init,
            out_dtype=policy.compute_dtype, name=name,
        )
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        kernel_init=init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class TimeEmbedMLP(nn.Module):
    """t-embedding MLP: Linear → SiLU → Linear (openaimodel.py:563-567)."""

    embed_dim: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.embed_dim, dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name="fc1")(t_emb)
        h = jax.nn.silu(h)
        return nn.Dense(self.embed_dim, dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name="fc2")(h)


class ResBlock(nn.Module):
    """GN→SiLU→conv, +t-emb, GN→SiLU→zero-conv, residual
    (openaimodel.py:163-275; PD config uses use_scale_shift_norm=False)."""

    out_channels: int
    policy: DTypePolicy
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        q8 = self.policy.quant == "int8" and not self.use_scale_shift_norm
        h = GroupNorm32(apply_silu=True, quant_out=q8, name="in_norm")(x)
        h = conv3x3(self.out_channels, dtype=self.policy.compute_dtype, name="in_conv", policy=self.policy)(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.policy.compute_dtype,
            param_dtype=jnp.float32,
            name="emb_proj",
        )(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = jax.nn.silu(h)
        else:
            h = h + emb_out.astype(h.dtype)
            h = GroupNorm32(apply_silu=True, quant_out=q8, name="out_norm")(h)
        h = conv3x3(self.out_channels, zero_init=True, dtype=self.policy.compute_dtype, name="out_conv", policy=self.policy)(h)

        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, dtype=self.policy.compute_dtype, name="skip", policy=self.policy)(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv (openaimodel.py:134-160)."""

    out_channels: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        return conv3x3(self.out_channels, stride=2, dtype=self.policy.compute_dtype, name="conv", policy=self.policy)(x)


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (openaimodel.py:91-116)."""

    out_channels: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv3x3(self.out_channels, dtype=self.policy.compute_dtype, name="conv", policy=self.policy)(x)


class ScaledDense(nn.Module):
    """Bias-free Dense whose kernel is multiplied by a constant at apply
    time. Param tree identical to nn.Dense (name/"kernel", same init), so
    checkpoint import/export is unaffected."""

    features: int
    scale: float
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features),
            jnp.float32,
        )
        w = (kernel * self.scale).astype(self.policy.compute_dtype)
        return jax.lax.dot_general(
            x.astype(self.policy.compute_dtype), w, (((x.ndim - 1,), (0,)), ((), ()))
        )


class CrossAttention(nn.Module):
    """Multi-head attention; self-attn when context is None
    (ldm/modules/attention.py:145-194)."""

    heads: int
    dim_head: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, context=None):
        """`x` (and self-attn `context`) may be a pre-quantized
        (int8, per-row scale) pair in int8 mode."""
        x_plain = x[0] if isinstance(x, tuple) else x
        inner = self.heads * self.dim_head
        out_dim = x_plain.shape[-1]
        context = x if context is None else context
        quant = self.policy.quant == "int8"
        if quant:
            from prompt_diffusion_tpu.ops.quant import QuantDense

            dense = lambda name: QuantDense(
                inner, use_bias=False, out_dtype=self.policy.compute_dtype, name=name
            )
        else:
            dense = lambda name: nn.Dense(
                inner, use_bias=False, dtype=self.policy.compute_dtype,
                param_dtype=jnp.float32, name=name
            )
        # Softmax scale folded into the to_q weights (fp32, before the
        # compute-dtype cast): kills one full (Nq,Nk) fp32 multiply pass per
        # head inside the kernel — measured 8% on the D=40 hot site
        # (tools/attn_lab2.py). Loop-invariant, so XLA hoists the weight
        # scaling out of the sampling scan.
        scale = self.dim_head ** -0.5
        if quant:
            from prompt_diffusion_tpu.ops.quant import QuantDense

            q = QuantDense(inner, use_bias=False, pre_scale=scale,
                           out_dtype=self.policy.compute_dtype, name="to_q")(x)
        else:
            q = ScaledDense(features=inner, scale=scale, policy=self.policy, name="to_q")(x)
        k = dense("to_k")(context)
        v = dense("to_v")(context)
        b, nq = q.shape[:2]
        nk = k.shape[1]
        from prompt_diffusion_tpu.ops.attention import _flash_eligible
        from prompt_diffusion_tpu.ops.flash_attention import flash_attention_packed

        if _flash_eligible(q, k, None):
            # packed-heads kernel: consumes the projection layout directly,
            # no (B,N,H,D)↔(B,H,N,D) copies. Cross-attention (77-token kv)
            # stays on XLA — measured 3.5% slower through the kernel.
            # int8 attention (v1 kernel) measured SLOWER here (0.898 vs
            # 0.9285 img/s e2e): at D=40 the int8 contraction still pads to
            # the full MXU tile, so the quant passes bought nothing. The v3
            # kernel (per-head K scalar, bf16 PV) has far less VPU overhead;
            # PD_SD15_INT8_ATTN=1 re-opts the int8 mode in for measurement
            # (read at import time — see _SD15_INT8_ATTN above).
            if quant and _SD15_INT8_ATTN:
                from prompt_diffusion_tpu.ops.flash_attention import (
                    flash_attention_packed_int8,
                )

                out = flash_attention_packed_int8(q, k, v, self.heads, scale=1.0)
            else:
                out = flash_attention_packed(q, k, v, self.heads, scale=1.0)
        else:
            qh = q.reshape(b, nq, self.heads, self.dim_head)
            kh = k.reshape(b, nk, self.heads, self.dim_head)
            vh = v.reshape(b, nk, self.heads, self.dim_head)
            out = dot_product_attention(
                qh, kh, vh, scale=1.0,
                softmax_dtype=self.policy.softmax_dtype, use_flash=False
            )
            out = out.reshape(b, nq, inner)
        if quant:
            from prompt_diffusion_tpu.ops.quant import QuantDense

            return QuantDense(out_dim, out_dtype=self.policy.compute_dtype,
                              name="to_out")(out)
        return nn.Dense(
            out_dim, dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name="to_out"
        )(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU FF: Linear→(x·gelu(gate))→Linear (attention.py:49-77)."""

    policy: DTypePolicy
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = (x[0] if isinstance(x, tuple) else x).shape[-1]
        inner = dim * self.mult
        if self.policy.quant == "int8":
            from prompt_diffusion_tpu.ops.quant import QuantDense

            dense = lambda f, name: QuantDense(
                f, out_dtype=self.policy.compute_dtype, name=name)
        else:
            dense = lambda f, name: nn.Dense(
                f, dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name=name)
        proj = dense(inner * 2, "proj")(x)
        if self.policy.quant == "int8" and _SD15_FUSED_GEGLU:
            from prompt_diffusion_tpu.ops.fused_act import fused_geglu_quant

            return dense(dim, "out")(fused_geglu_quant(proj))
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return dense(dim, "out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → GEGLU FF, each with pre-LN + residual
    (attention.py:246-275)."""

    heads: int
    dim_head: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, context=None):
        quant = self.policy.quant == "int8"
        # int8 mode: the pre-LNs quantize inside the LN kernel and the
        # q/k/v/FF QuantDenses consume the (int8, per-row scale) pair —
        # no standalone dynamic-quant HBM passes.
        ln = lambda name: FusedLayerNorm(quant_out=quant, name=name)
        cast = (lambda h: h) if quant else (lambda h: h.astype(x.dtype))
        attn = lambda name: CrossAttention(
            heads=self.heads, dim_head=self.dim_head, policy=self.policy, name=name
        )
        x = x + attn("attn1")(cast(ln("norm1")(x)))
        x = x + attn("attn2")(cast(ln("norm2")(x)), context=context)
        x = x + GEGLUFeedForward(policy=self.policy, name="ff")(cast(ln("norm3")(x)))
        return x


class SpatialTransformer(nn.Module):
    """NHWC↔NLC transformer wrapper with 1x1-conv projections and
    zero-initialized proj_out (attention.py:278-340)."""

    heads: int
    dim_head: int
    depth: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm32(eps=1e-6, quant_out=self.policy.quant == "int8", name="norm")(x)
        x = conv1x1(inner, dtype=self.policy.compute_dtype, name="proj_in", policy=self.policy)(x)
        x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads, dim_head=self.dim_head, policy=self.policy, name=f"block_{d}"
            )(x, context=context)
        x = x.reshape(b, h, w, inner)
        x = conv1x1(c, zero_init=True, dtype=self.policy.compute_dtype, name="proj_out", policy=self.policy)(x)
        return x + residual

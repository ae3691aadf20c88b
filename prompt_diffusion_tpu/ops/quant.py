"""int8 (W8A8) quantized matmul/conv building blocks — opt-in serving mode.

v5e's MXU runs int8 at ~1.7× the bf16 rate (measured: 235 TOP/s vs
140 TF/s on this chip, tools/int8_probe.py), and the 512² ε-step is
MXU-bound after the round-2 kernel work. This module provides drop-in
quantized versions of the hot convs/denses:

  * weights: symmetric per-output-channel int8, quantized from the SAME
    fp32 params at apply time — the quantization is loop-invariant, so XLA
    hoists it out of the sampling scan; checkpoints stay fp32 and the
    param tree is identical to nn.Conv / nn.Dense.
  * activations: symmetric per-tensor *dynamic* int8 (amax computed per
    call) — no calibration pass needed, robust across CFG scales.
  * accumulation: int32 on the MXU, dequantized to the compute dtype with
    the fused (s_a · s_w[oc]) per-channel factor.

Exactness notes: an all-zero weight tensor (fresh zero-convs) quantizes
to exactly zero output (scale is clamped, wq == 0). Layers whose inputs
are unbounded (time embeddings) or that run once per generation (hint
encoders, VAE) stay bf16 — see DTypePolicy.quant routing in
models/layers.py.

This is an inference-only path (round-to-nearest has zero gradient);
training always uses the bf16 policy. No reference counterpart —
the reference serves fp16 (README.md:48); this is the TPU-native
production-serving lever past bf16 speed-of-light.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.ops.int8_conv import (
    conv3x3_int8,
    conv3x3_int8_supported,
)

_EPS = 1e-8


def _quant_weight(kernel: jnp.ndarray, reduce_axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 kernel → (int8 kernel, per-out-channel fp32 scale)."""
    amax = jnp.max(jnp.abs(kernel), axis=reduce_axes, keepdims=True)
    s_w = jnp.maximum(amax / 127.0, _EPS)
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


def _quant_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """activation → (int8 tensor, per-tensor fp32 scale), dynamic."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s_a = jnp.maximum(amax / 127.0, _EPS)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a), -127, 127).astype(jnp.int8)
    return xq, s_a


def quant_act_pair(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Explicitly quantize an activation ONCE for multiple QuantDense
    consumers (e.g. the q/k/v projections sharing one AdaLN output) —
    passing the pair avoids each dense re-running amax+round over the
    same tensor."""
    return _quant_act(x)


class QuantConv(nn.Module):
    """int8 W8A8 convolution; param tree identical to nn.Conv
    (kernel (kh,kw,cin,cout), bias (cout,))."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: int = 0
    zero_init: bool = False
    use_bias: bool = True
    out_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """`x` is either a float activation (dynamic per-tensor quant here)
        or a pre-quantized `(int8 tensor, per-sample scale (B,))` pair from
        a producing GN/LN kernel's fused int8 epilogue."""
        if isinstance(x, tuple):
            xq, s_a = x
            s_a = s_a.reshape(-1, 1, 1, 1)
        else:
            xq, s_a = _quant_act(x)
        kh, kw = self.kernel_size
        cin = xq.shape[-1]
        init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (kh, kw, cin, self.features), jnp.float32)
        wq, s_w = _quant_weight(kernel, reduce_axes=(0, 1, 2))  # (1,1,1,Cout)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                if self.use_bias else None)

        b, h, w = xq.shape[:3]
        if (
            (kh, kw) == (3, 3)
            and self.strides == (1, 1)
            and self.padding == 1
            and jax.default_backend() != "cpu"
            and conv3x3_int8_supported(h, w, cin, self.features)
        ):
            # Pallas kernel: int8 MXU dots at the dense rate (~235 TOP/s)
            # vs XLA's slow int8 conv lowering (~118 TF/s) — see
            # ops/int8_conv.py. Bit-identical int32 accumulation.
            s_a_vec = jnp.broadcast_to(
                jnp.asarray(s_a, jnp.float32).reshape(-1), (b,))
            return conv3x3_int8(
                xq, s_a_vec, wq, s_w.reshape(-1), bias,
                out_dtype=self.out_dtype)

        if (kh, kw) == (1, 1) and self.strides == (1, 1):
            # 1x1 conv IS a dense layer — use the int8 dot path (fast MXU
            # lowering) instead of the conv lowering.
            o = jax.lax.dot_general(
                xq, wq.reshape(cin, self.features), (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            pad = [(self.padding, self.padding)] * 2
            dn = jax.lax.conv_dimension_numbers(
                xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
            o = jax.lax.conv_general_dilated(
                xq, wq, self.strides, pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
        out = o.astype(jnp.float32) * (s_a * s_w.reshape(1, 1, 1, -1))
        if bias is not None:
            out = out + bias
        return out.astype(self.out_dtype)


class QuantDense(nn.Module):
    """int8 W8A8 dense; param tree identical to nn.Dense. `pre_scale`
    folds a constant into the weights before quantization (the attention
    softmax scale — see ScaledDense)."""

    features: int
    use_bias: bool = True
    pre_scale: float = 1.0
    out_dtype: jnp.dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        """`x` is a float activation (dynamic per-tensor quant here) or a
        pre-quantized `(int8, scale)` pair from an LN kernel's fused int8
        epilogue (per-row scales, shape (..., N, 1))."""
        if isinstance(x, tuple):
            xq, s_a = x
        else:
            xq, s_a = _quant_act(x)
        cin = xq.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (cin, self.features), jnp.float32)
        wq, s_w = _quant_weight(kernel * self.pre_scale, reduce_axes=(0,))  # (1, Cout)
        o = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = o.astype(jnp.float32) * (s_a * s_w.reshape((1,) * (xq.ndim - 1) + (-1,)))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.out_dtype)

"""Dtype policy for TPU execution.

The reference (ldm) runs fp32 end-to-end for training and fp16 for some
inference, forcing fp32 in GroupNorm (`ldm/modules/diffusionmodules/util.py:217`)
and in the attention softmax (`ldm/modules/attention.py:173-179`).

On TPU the right policy is: bf16 activations + matmuls (MXU-native),
fp32 parameters / reductions (GroupNorm stats, softmax, loss). This module
centralizes that choice so every model takes one `DTypePolicy`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Where each class of tensor lives.

    param_dtype:   dtype in which parameters are stored.
    compute_dtype: dtype fed to convs/matmuls (MXU wants bf16).
    norm_dtype:    dtype used for normalization statistics (keep fp32 —
                   matches the reference's fp32 GroupNorm).
    softmax_dtype: dtype for attention logits+softmax (keep fp32 — matches
                   the reference's _ATTN_PRECISION=fp32 path).
    """

    param_dtype: Dtype = jnp.float32
    compute_dtype: Dtype = jnp.bfloat16
    norm_dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32
    # "none" | "int8": W8A8 dynamic quantization of the hot convs/denses
    # (ops/quant.py). Inference-only serving mode — round() has zero
    # gradient, so trainers must keep "none".
    quant: str = "none"

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)


def default_policy() -> DTypePolicy:
    return DTypePolicy()


def int8_policy() -> DTypePolicy:
    """bf16 + int8-quantized matmul/conv serving mode (~1.7× MXU rate on
    v5e; attention, norms, softmax and once-per-run layers stay bf16/fp32)."""
    return DTypePolicy(quant="int8")


def fp32_policy() -> DTypePolicy:
    """Full fp32 — used in tests for numerics golden checks."""
    return DTypePolicy(compute_dtype=jnp.float32)


def cast_params_bf16(params, keep_fp32_names=("scale", "bias")):
    """Cast parameter leaves to bf16 for inference (halves weight HBM
    traffic); norm affine params stay fp32 (fp32-stat GroupNorm/LayerNorm
    upcast them anyway)."""
    import jax

    def cast(path, x):
        name = getattr(path[-1], "key", "") if path else ""
        if name in keep_fp32_names or x.dtype != jnp.float32:
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)

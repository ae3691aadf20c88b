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


def fast_random_params_bf16(module, rng, *init_args, kernel_std=0.02,
                            keep_fp32_names=("scale", "bias")):
    """Random bf16 parameter tree WITHOUT tracing the module's forward.

    flax `init` executes the full forward pass to infer shapes; jitting it
    for T5-XXL compiles a 4.7B-param program (~190 s measured on one chip)
    just to produce weights a benchmark immediately overwrites with random
    values anyway. Here shapes come from `jax.eval_shape` (free) and leaves
    are filled by one small jitted program: ndim>=2 leaves get
    N(0, kernel_std), "bias"-named leaves get zeros, other 1-D leaves
    (norm scales) get ones — so activation magnitudes stay sane. Dtype rule
    matches `cast_params_bf16` (norm affines fp32, everything else bf16).
    Benchmark / serving-lab use ONLY: values are neither trained nor
    reference-initialized."""
    import jax

    shapes = jax.eval_shape(lambda r: module.init(r, *init_args), rng)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def fill(key):
        keys = jax.random.split(key, len(paths_leaves))
        out = []
        for k, (path, leaf) in zip(keys, paths_leaves):
            name = getattr(path[-1], "key", "") if path else ""
            if not jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
                continue
            dt = jnp.float32 if name in keep_fp32_names else jnp.bfloat16
            if len(leaf.shape) >= 2:
                out.append(jax.random.normal(k, leaf.shape, dt)
                           * jnp.asarray(kernel_std, dt))
            elif name == "bias":
                out.append(jnp.zeros(leaf.shape, dt))
            else:
                out.append(jnp.ones(leaf.shape, dt))
        return out

    return jax.tree_util.tree_unflatten(treedef, jax.jit(fill)(rng))

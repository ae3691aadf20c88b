"""Normalization ops.

`group_norm` reproduces the reference's fp32 GroupNorm semantics
(GroupNorm32, ldm/modules/diffusionmodules/util.py:217-219: stats and affine
in fp32, result cast back to the activation dtype), in NHWC layout with the
channel axis last so the reduction vectorizes across lanes.

XLA fuses norm+SiLU+conv-input chains on its own; a fused Pallas variant is
only worth it for the largest activations, so we keep this as pure jnp and
let the compiler fuse.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def group_norm(
    x: jnp.ndarray,  # (..., C), typically (B, H, W, C)
    num_groups: int,
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    eps: float = 1e-5,
    apply_silu: bool = False,
    apply_relu: bool = False,
) -> jnp.ndarray:
    """GroupNorm over channel groups with fp32 statistics."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    xf = x.astype(jnp.float32)
    grouped = xf.reshape(x.shape[:-1] + (num_groups, c // num_groups))
    # reduce over all spatial dims + within-group channels
    red_axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = grouped.mean(axis=red_axes, keepdims=True)
    var = grouped.var(axis=red_axes, keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    elif apply_relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(orig_dtype)

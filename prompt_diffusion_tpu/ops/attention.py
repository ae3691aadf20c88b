"""Attention ops.

The reference computes attention as einsum QKᵀ → fp32 softmax → PV
(ldm/modules/attention.py:145-194, with `_ATTN_PRECISION=fp32` forcing the
softmax in fp32), or via the xformers CUDA kernel (:197-243).

TPU-native policy: inputs/outputs bf16, QKᵀ and PV run on the MXU with fp32
accumulation (`preferred_element_type`), softmax in fp32 — numerically the
same guarantee the reference makes. A Pallas flash-attention kernel
(`prompt_diffusion_tpu.ops.flash_attention`) provides the blockwise
HBM-friendly path for long sequences; this module picks between them.

Layout: (batch, seq, heads, head_dim) — "BNHD". No (b·h) flattening like
torch; XLA fuses the head axis fine and the layout keeps lane dims last.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # (B, Nq, H, D)
    k: jnp.ndarray,  # (B, Nk, H, D)
    v: jnp.ndarray,  # (B, Nk, H, D)
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Nq, Nk)
    softmax_dtype=jnp.float32,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head scaled-dot-product attention with fp32 softmax.

    `use_flash=None` auto-selects the Pallas kernel when shapes qualify
    (TPU backend, no mask, Nq·Nk large enough to be HBM-bound).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_flash is None:
        use_flash = _flash_eligible(q, k, mask)
    if use_flash:
        if mask is not None:
            raise ValueError(
                "use_flash=True with a mask: the flash kernel has no mask "
                "support — drop use_flash (auto-select routes masked "
                "attention to the einsum path) or drop the mask")
        from prompt_diffusion_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=softmax_dtype
    )
    logits = logits.astype(softmax_dtype) * scale
    if mask is not None:
        neg = jnp.finfo(softmax_dtype).min
        logits = jnp.where(mask, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def _flash_eligible(q, k, mask) -> bool:
    if mask is not None:
        return False
    nq, nk = q.shape[1], k.shape[1]
    return _kernel_eligible(nq) and nk >= 1024


def _kernel_eligible(nq: int) -> bool:
    """Pallas attention pays off for long query sequences (self-attn at
    ds1/ds2, and cross-attn whose fp32 logits XLA would round-trip to HBM)."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend not in ("tpu", "axon"):
        return False
    return nq >= 1024

"""CLIP ViT-L/14 text encoder as a Flax module.

TPU-native replacement for `FrozenCLIPEmbedder`
(ldm/modules/encoders/modules.py:88-131), which wraps HF
`openai/clip-vit-large-patch14`: 12 layers, hidden 768, 12 heads,
quick-gelu MLP, causal mask, 77 positions, final LayerNorm. Supports the
reference's layer selection: "last" (default), "pooled", or "hidden"
with clip_skip-style layer index.

The encoder is tiny next to the UNet — plain XLA einsum attention is the
right kernel here (77 tokens).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    # "quick_gelu" for CLIP-L (SD1.5); "gelu" for OpenCLIP bigG (SD3's 2nd encoder)
    activation: str = "quick_gelu"
    eot_token_id: int = 49407  # pooled-output anchor (HF eos_token_id)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(
            cfg.hidden_size, dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name=name
        )
        b, n, _ = x.shape
        q = dense("q_proj")(x).reshape(b, n, cfg.num_heads, d)
        k = dense("k_proj")(x).reshape(b, n, cfg.num_heads, d)
        v = dense("v_proj")(x).reshape(b, n, cfg.num_heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (d**-0.5) + causal_mask
        probs = jax.nn.softmax(logits.astype(self.policy.softmax_dtype), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(b, n, -1)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.policy.norm_dtype,
            param_dtype=jnp.float32, name=name,
        )
        h = ln("layer_norm1")(x).astype(x.dtype)
        x = x + CLIPAttention(cfg, self.policy, name="self_attn")(h, causal_mask)
        h = ln("layer_norm2")(x).astype(x.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.policy.compute_dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = _act(cfg.activation)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.policy.compute_dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, 77) int32
        output_hidden_layer: Optional[int] = None,  # None=last; else index from end
    ):
        """Returns dict(last_hidden_state, pooled, hidden)."""
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                       dtype=self.policy.compute_dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size), jnp.float32,
        )
        x = tok + pos[None, :n].astype(tok.dtype)

        neg = jnp.finfo(jnp.float32).min
        causal_mask = jnp.triu(jnp.full((n, n), neg, dtype=jnp.float32), k=1)[None, None]

        penultimate = None
        for i in range(cfg.num_layers):
            if output_hidden_layer is not None and i == cfg.num_layers - output_hidden_layer:
                penultimate = x
            x = CLIPEncoderLayer(cfg, self.policy, name=f"layers_{i}")(x, causal_mask)

        final = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.policy.norm_dtype,
                             param_dtype=jnp.float32, name="final_layer_norm")(x)
        final = final.astype(jnp.float32)
        # pooled = hidden state at the FIRST eot token. Matching the id
        # (not argmax of the raw ids): textual-inversion placeholder ids
        # sit ABOVE the eot id (tools/loaders appends them at 49408+), so
        # the legacy argmax picks the TI token's position instead — the
        # same bug HF fixed by matching eos_token_id.
        eot_idx = jnp.argmax((input_ids == cfg.eot_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = final[jnp.arange(b), eot_idx]
        return {
            "last_hidden_state": final,
            "pooled": pooled,
            "hidden": penultimate.astype(jnp.float32) if penultimate is not None else None,
        }

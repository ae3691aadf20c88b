"""T5 encoder stack (SD3's third text encoder, T5-XXL).

TPU-native equivalent of the reference's HF `T5EncoderModel` usage
(train_promptdiffusion_sd3.py:871-906; FrozenT5Embedder in
ldm/modules/encoders/modules.py:58-85): pre-RMSNorm blocks, relative
position bias from a shared bucket table (layer 0, reused by all layers),
gated-GELU feed-forward, no biases anywhere, final RMSNorm.

Weight import from a HF torch state dict via `t5_params_from_state_dict`
in tools/diffusers_import (T5 Linear layers have no bias; attention has no
scaling — T5 bakes the 1/sqrt(d) into the weights). Token ids come from
data/t5_tokenizer (pure-python Unigram matching T5TokenizerFast).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class T5Config:
    """Defaults = T5-XXL (google/t5-v1_1-xxl) as used by SD3."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5's bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    policy: DTypePolicy
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg, pol = self.config, self.policy
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda n, name: nn.Dense(n, use_bias=False, dtype=pol.compute_dtype,
                                         param_dtype=jnp.float32, name=name)
        b, L, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        k = dense(inner, "k")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)
        v = dense(inner, "v")(x).reshape(b, L, cfg.num_heads, cfg.d_kv)

        if self.has_relative_bias:
            rel_pos = (
                jnp.arange(L)[None, :] - jnp.arange(L)[:, None]
            )  # memory_pos - query_pos
            buckets = _relative_position_bucket(
                rel_pos, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            bias_table = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32,
            )
            position_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # (1,H,L,L)

        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits.astype(jnp.float32) + position_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(b, L, inner)
        return dense(cfg.d_model, "o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    policy: DTypePolicy
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg, pol = self.config, self.policy
        h = RMSNorm(cfg.layer_norm_eps, name="ln_attn")(x)
        attn_out, position_bias = T5Attention(
            cfg, pol, has_relative_bias=self.has_relative_bias, name="attn"
        )(h, position_bias)
        x = x + attn_out
        h = RMSNorm(cfg.layer_norm_eps, name="ln_ff")(x)
        dense = lambda n, name: nn.Dense(n, use_bias=False, dtype=pol.compute_dtype,
                                         param_dtype=jnp.float32, name=name)
        wi0 = dense(cfg.d_ff, "wi_0")(h)
        wi1 = dense(cfg.d_ff, "wi_1")(h)
        ff = dense(cfg.d_model, "wo")(jax.nn.gelu(wi0, approximate=True) * wi1)
        return x + ff, position_bias


class T5Encoder(nn.Module):
    config: T5Config = T5Config()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg, pol = self.config, self.policy
        x = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32,
                     dtype=pol.compute_dtype, name="token_embedding")(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, pol, has_relative_bias=(i == 0), name=f"blocks_{i}"
            )(x, position_bias)
        x = RMSNorm(cfg.layer_norm_eps, name="final_norm")(x)
        return x.astype(jnp.float32)

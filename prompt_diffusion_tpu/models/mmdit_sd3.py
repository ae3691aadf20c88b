"""SD3 MMDiT transformer (flow-matching backbone) as Flax modules, NHWC.

TPU-native re-expression of diffusers' `SD3Transformer2DModel` +
`JointTransformerBlock` as consumed by the reference SD3 pipeline/trainer
(promptdiffusioncontrolnet_sd3.py:44-483,
promptdiffusioncontrolnetpipeline_sd3.py:855-1280,
train_promptdiffusion_sd3.py:809-1317):

  * PatchEmbed: 2×2 conv patchify + learned pos-embed grid (interpolated
    around a base grid like diffusers' cropped pos embed).
  * CombinedTimestepTextProjEmbeddings: sinusoidal t-embed → MLP, plus
    pooled (CLIP) projection → MLP, summed.
  * JointTransformerBlock: dual-stream (context ‖ latent) attention with
    AdaLayerNormZero modulation; the final block is context_pre_only.
  * AdaLayerNormContinuous + linear head back to patches.

Attention runs through the shared `dot_product_attention` (fp32 softmax,
Pallas flash kernel when shapes qualify).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.models.layers import timestep_embedding
from prompt_diffusion_tpu.ops.attention import dot_product_attention
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    """SD3-medium defaults (sample 128 → 1024² pixels)."""

    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5/CLIP joint text width
    caption_projection_dim: int = 1536  # = heads * head_dim
    pooled_projection_dim: int = 2048
    out_channels: int = 16
    pos_embed_max_size: int = 192
    use_checkpoint: bool = False

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def _2d_sincos_pos_embed(dim: int, grid: int, base_size: int) -> np.ndarray:
    """Fixed 2D sin-cos position embedding table (grid², dim).

    Positions are scaled by base_size/grid (base_size = sample_size /
    patch_size) exactly like diffusers' get_2d_sincos_pos_embed builds the
    persistent `pos_embed.pos_embed` buffer SD3 checkpoints carry — the
    table is recomputed here, so the scaling must match or every real
    checkpoint sees wrong positions."""
    def _1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(grid, dtype=np.float64) / (grid / base_size)
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    emb = np.concatenate([_1d(dim // 2, gx), _1d(dim // 2, gy)], axis=1)
    return emb.astype(np.float32)  # (grid*grid, dim)


class PatchEmbed(nn.Module):
    """2×2 patchify conv + center-cropped fixed sin-cos pos embed."""

    config: MMDiTConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,H,W,C) → (B,N,D)
        cfg = self.config
        p = cfg.patch_size
        b, h, w, _ = x.shape
        x = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), dtype=self.policy.compute_dtype,
            param_dtype=jnp.float32, name="proj",
        )(x)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        table = _2d_sincos_pos_embed(
            cfg.hidden_size, cfg.pos_embed_max_size, cfg.sample_size // cfg.patch_size
        )
        table = table.reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, -1)
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = jnp.asarray(table[top : top + gh, left : left + gw]).reshape(1, gh * gw, -1)
        return x + pos.astype(x.dtype)


class TimestepTextEmbed(nn.Module):
    """CombinedTimestepTextProjEmbeddings: sinusoidal(256)→MLP + pooled→MLP."""

    config: MMDiTConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, timestep: jnp.ndarray, pooled: jnp.ndarray) -> jnp.ndarray:
        cfg, pol = self.config, self.policy
        # diffusers Timesteps(256, flip_sin_to_cos=True, shift=0): [cos|sin]
        t_emb = timestep_embedding(timestep, 256).astype(pol.compute_dtype)
        dense = lambda n, name: nn.Dense(n, dtype=pol.compute_dtype, param_dtype=jnp.float32, name=name)
        t = dense(cfg.hidden_size, "timestep_fc1")(t_emb)
        t = dense(cfg.hidden_size, "timestep_fc2")(jax.nn.silu(t))
        c = dense(cfg.hidden_size, "text_fc1")(pooled.astype(pol.compute_dtype))
        c = dense(cfg.hidden_size, "text_fc2")(jax.nn.silu(c))
        return t + c


class AdaLayerNormZero(nn.Module):
    """LN (no affine) + 6-way modulation from the conditioning embedding."""

    policy: DTypePolicy
    n_mods: int = 6

    @nn.compact
    def __call__(self, x, emb):
        dim = x.shape[-1]
        mods = nn.Dense(
            self.n_mods * dim, dtype=self.policy.compute_dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="proj",
        )(jax.nn.silu(emb))
        mods = jnp.split(mods[:, None, :], self.n_mods, axis=-1)
        if self.policy.quant == "int8":
            # fused AdaLN→int8 epilogue: stats+modulate+quantize in one
            # VMEM pass with per-row scales; the (int8, scale) pair feeds
            # the q/k/v QuantDenses directly (ops/fused_adaln.py — kills
            # round-2's per-tensor amax pass + HBM round-trip per site)
            from prompt_diffusion_tpu.ops.fused_adaln import fused_adaln_quant

            if self.n_mods == 6:
                shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
                pair = fused_adaln_quant(x, scale_msa, shift_msa)
                return pair, gate_msa, shift_mlp, scale_mlp, gate_mlp
            scale, shift = mods
            return fused_adaln_quant(x, scale, shift)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.policy.norm_dtype, name="norm")(x).astype(x.dtype)
        if self.n_mods == 6:
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
            return h * (1 + scale_msa) + shift_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp
        # AdaLayerNormContinuous chunk order is (scale, shift) — opposite of
        # AdaLayerNormZero's shift-first (diffusers normalization.py)
        scale, shift = mods
        return h * (1 + scale) + shift


class JointBlock(nn.Module):
    """Dual-stream joint attention block (diffusers JointTransformerBlock)."""

    config: MMDiTConfig
    policy: DTypePolicy
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, hidden, context, emb):
        cfg, pol = self.config, self.policy
        dim = cfg.hidden_size
        heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
        if pol.quant == "int8":
            # the block's projections/FFs are the MMDiT FLOP bulk and are
            # high-arithmetic-intensity (4k+ tokens × 1536) — the shapes
            # where W8A8 actually pays (unlike the SD1.5 convs, see
            # docs/ROADMAP.md); AdaLN modulation + norms stay bf16/fp32
            from prompt_diffusion_tpu.ops.quant import QuantDense

            dense = lambda n, name, zero=False: QuantDense(
                n, out_dtype=pol.compute_dtype,
                kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
                name=name)
        else:
            dense = lambda n, name, zero=False: nn.Dense(
                n, dtype=pol.compute_dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
                name=name,
            )

        h_mod, h_gate, h_shift_mlp, h_scale_mlp, h_gate_mlp = AdaLayerNormZero(
            pol, name="norm1"
        )(hidden, emb)
        if self.context_pre_only:
            c_mod = AdaLayerNormZero(pol, n_mods=2, name="norm1_context")(context, emb)
            c_gate = c_shift_mlp = c_scale_mlp = c_gate_mlp = None
        else:
            c_mod, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                pol, name="norm1_context"
            )(context, emb)
        # int8 mode: h_mod/c_mod arrive as (int8, row-scale) pairs straight
        # from the fused AdaLN→int8 kernel (quantized ONCE for the three
        # q/k/v projections; see AdaLayerNormZero)
        b, n_h = (h_mod[0] if isinstance(h_mod, tuple) else h_mod).shape[:2]
        n_c = (c_mod[0] if isinstance(c_mod, tuple) else c_mod).shape[1]
        qp = jnp.concatenate(
            [dense(dim, "to_q")(h_mod), dense(dim, "add_q_proj")(c_mod)], axis=1)
        kp = jnp.concatenate(
            [dense(dim, "to_k")(h_mod), dense(dim, "add_k_proj")(c_mod)], axis=1)
        vp = jnp.concatenate(
            [dense(dim, "to_v")(h_mod), dense(dim, "add_v_proj")(c_mod)], axis=1)
        if pol.quant == "int8" and jax.default_backend() != "cpu":
            # int8 QKᵀ (bf16 PV) with fp32 softmax — attention is ~58% of the SD3
            # ε-step (36 sites × 3.7 ms, tools/trace_sd3.py) and the last
            # bf16 holdout in the int8 serving mode
            from prompt_diffusion_tpu.ops.flash_attention import (
                flash_attention_packed_int8,
            )

            attn = flash_attention_packed_int8(qp, kp, vp, heads)
        else:
            n = n_h + n_c
            attn = dot_product_attention(
                qp.reshape(b, n, heads, hd), kp.reshape(b, n, heads, hd),
                vp.reshape(b, n, heads, hd), softmax_dtype=pol.softmax_dtype,
            ).reshape(b, n, dim)
        attn_h, attn_c = attn[:, :n_h], attn[:, n_h:]

        if pol.quant == "int8":
            from prompt_diffusion_tpu.ops.fused_act import (
                fused_gelu_quant,
                fused_quant_rows,
            )
            from prompt_diffusion_tpu.ops.fused_adaln import fused_adaln_quant

            mod2 = lambda x, s, t, name: fused_adaln_quant(x, s, t)
            # remaining standalone-quant sites get fused epilogues too:
            # post-GELU (the block's widest activation, (B,N,4C)) and the
            # attention outputs — one VMEM pass each, per-row scales
            act = fused_gelu_quant
            rowq = fused_quant_rows
        else:
            def mod2(x, s, t, name):
                h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                 dtype=pol.norm_dtype, name=name)(x).astype(x.dtype)
                return h * (1 + s) + t

            act = lambda x: jax.nn.gelu(x, approximate=True)
            rowq = lambda x: x

        hidden = hidden + h_gate * dense(dim, "to_out")(rowq(attn_h))
        hn = mod2(hidden, h_scale_mlp, h_shift_mlp, "norm2")
        ff = dense(dim * 4, "ff_in")(hn)
        ff = dense(dim, "ff_out")(act(ff))
        hidden = hidden + h_gate_mlp * ff

        if self.context_pre_only:
            return hidden, None
        context = context + c_gate * dense(dim, "to_add_out")(rowq(attn_c))
        cn = mod2(context, c_scale_mlp, c_shift_mlp, "norm2_context")
        cff = dense(dim * 4, "ff_context_in")(cn)
        cff = dense(dim, "ff_context_out")(act(cff))
        context = context + c_gate_mlp * cff
        return hidden, context


class SD3Transformer(nn.Module):
    """The MMDiT ε/velocity model. Consumes optional per-block ControlNet
    residuals exactly like the reference
    (`block_controlnet_hidden_states`, interval-scaled over layers —
    promptdiffusioncontrolnetpipeline_sd3.py:1211-1231)."""

    config: MMDiTConfig = MMDiTConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,  # (B, H, W, C) NHWC
        timestep: jnp.ndarray,  # (B,) float (flow-match t in [0, T])
        encoder_hidden_states: jnp.ndarray,  # (B, L, joint_attention_dim)
        pooled_projections: jnp.ndarray,  # (B, pooled_projection_dim)
        block_controlnet_hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> jnp.ndarray:
        cfg, pol = self.config, self.policy
        b, h, w, _ = latents.shape
        p = cfg.patch_size

        hidden = PatchEmbed(cfg, pol, name="pos_embed")(latents.astype(pol.compute_dtype))
        emb = TimestepTextEmbed(cfg, pol, name="time_text_embed")(
            timestep, pooled_projections
        )
        context = nn.Dense(
            cfg.caption_projection_dim, dtype=pol.compute_dtype, param_dtype=jnp.float32,
            name="context_embedder",
        )(encoder_hidden_states.astype(pol.compute_dtype))

        block_cls = nn.remat(JointBlock) if cfg.use_checkpoint else JointBlock
        for i in range(cfg.num_layers):
            pre_only = i == cfg.num_layers - 1
            hidden, context = block_cls(
                cfg, pol, context_pre_only=pre_only, name=f"blocks_{i}"
            )(hidden, context, emb)
            if block_controlnet_hidden_states is not None and not pre_only:
                # float interval + int() truncation, exactly like diffusers'
                # SD3Transformer2DModel (matters when layers % taps != 0)
                interval = cfg.num_layers / len(block_controlnet_hidden_states)
                hidden = hidden + block_controlnet_hidden_states[int(i / interval)].astype(
                    hidden.dtype
                )

        # AdaLayerNormContinuous head (scale-first chunk order)
        mods = nn.Dense(
            2 * cfg.hidden_size, dtype=pol.compute_dtype, param_dtype=jnp.float32,
            name="norm_out_proj",
        )(jax.nn.silu(emb))
        scale, shift = jnp.split(mods[:, None, :], 2, axis=-1)
        hidden = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                              dtype=pol.norm_dtype, name="norm_out")(hidden).astype(
            pol.compute_dtype
        )
        hidden = hidden * (1 + scale) + shift
        out = nn.Dense(p * p * cfg.out_channels, dtype=pol.compute_dtype,
                       param_dtype=jnp.float32, name="proj_out")(hidden)
        # unpatchify → NHWC
        gh, gw = h // p, w // p
        out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
        return out.astype(jnp.float32)

"""Torch fixture: the SD3 (MMDiT) module math as consumed by the reference.

The reference's SD3 stack builds on diffusers classes that are not
installed in this environment (`promptdiffusioncontrolnet_sd3.py:1-40`
imports JointTransformerBlock/PatchEmbed/CombinedTimestepTextProjEmbeddings
from diffusers; the vendored `controlnet_sd3.py` likewise). This file
restates exactly the math those classes perform — same state_dict key
names, same chunk orders, same activation variants — so parity tests can
compare our Flax MMDiT elementwise against an executable torch reference:

  * get_2d_sincos_pos_embed / PatchEmbed with pos_embed_max_size cropping
    and base_size-scaled grid (diffusers models/embeddings.py)
  * CombinedTimestepTextProjEmbeddings: Timesteps(256, flip_sin_to_cos,
    shift=0) → TimestepEmbedding MLP, + PixArtAlphaTextProjection(silu)
  * AdaLayerNormZero (shift,scale,gate ×2 — shift first) and
    AdaLayerNormContinuous (scale first) (models/normalization.py)
  * JointTransformerBlock / joint attention: sample-first concat of
    (to_q‖add_q_proj) streams, bias=True projections, to_out / to_add_out
    split (models/attention.py, attention_processor.py)
  * FeedForward with gelu-approximate (tanh)
  * SD3 ControlNet additions per the reference
    (`promptdiffusioncontrolnet_sd3.py:114-198,362-483`): down_proj 6→3
    conv, zero-init pos_embed_input patchify applied to cond AND pair,
    per-block Linear taps, conditioning_scale.

Written for tests only: fp32, eager, no dropout.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --- positional embedding (diffusers models/embeddings.py) -----------------

def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim, grid_size, base_size, interpolation_scale=1.0):
    grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
    grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # w first (diffusers quirk)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (grid², D)


class PatchEmbed(nn.Module):
    def __init__(self, height, width, patch_size, in_channels, embed_dim,
                 pos_embed_max_size=None, pos_embed_type="sincos"):
        super().__init__()
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = nn.Conv2d(in_channels, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        if pos_embed_type == "sincos":
            base_size = height // patch_size
            table = get_2d_sincos_pos_embed(embed_dim, pos_embed_max_size, base_size)
            self.register_buffer(
                "pos_embed", torch.from_numpy(table).float().unsqueeze(0),
                persistent=True,
            )
        else:
            self.pos_embed = None

    def cropped_pos_embed(self, height, width):
        height = height // self.patch_size
        width = width // self.patch_size
        top = (self.pos_embed_max_size - height) // 2
        left = (self.pos_embed_max_size - width) // 2
        spatial = self.pos_embed.reshape(
            1, self.pos_embed_max_size, self.pos_embed_max_size, -1
        )
        spatial = spatial[:, top : top + height, left : left + width, :]
        return spatial.reshape(1, height * width, -1)

    def forward(self, latent):
        h, w = latent.shape[-2:]
        latent = self.proj(latent).flatten(2).transpose(1, 2)  # (B, N, D)
        if self.pos_embed is None:
            return latent
        return latent + self.cropped_pos_embed(h, w)


# --- timestep/text conditioning ---------------------------------------------

def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=True,
                           downscale_freq_shift=0.0, max_period=10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(F.silu(self.linear_1(sample)))


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.linear_2 = nn.Linear(hidden_size, hidden_size)

    def forward(self, caption):
        return self.linear_2(F.silu(self.linear_1(caption)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim)

    def forward(self, timestep, pooled_projection):
        t = get_timestep_embedding(timestep, 256)
        return self.timestep_embedder(t) + self.text_embedder(pooled_projection)


# --- norms -------------------------------------------------------------------

class AdaLayerNormZero(nn.Module):
    def __init__(self, embedding_dim, dim):
        super().__init__()
        self.linear = nn.Linear(embedding_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, embedding_dim, conditioning_embedding_dim):
        super().__init__()
        self.linear = nn.Linear(conditioning_embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(F.silu(conditioning_embedding))
        scale, shift = torch.chunk(emb, 2, dim=1)  # scale FIRST here
        return self.norm(x) * (1 + scale)[:, None] + shift[:, None]


# --- attention / feed-forward ------------------------------------------------

class JointAttention(nn.Module):
    """diffusers Attention with added_kv_proj_dim + JointAttnProcessor2_0."""

    def __init__(self, dim, heads, head_dim, context_pre_only):
        super().__init__()
        self.heads = heads
        self.head_dim = head_dim
        self.context_pre_only = context_pre_only
        inner = heads * head_dim
        self.to_q = nn.Linear(dim, inner, bias=True)
        self.to_k = nn.Linear(dim, inner, bias=True)
        self.to_v = nn.Linear(dim, inner, bias=True)
        self.add_q_proj = nn.Linear(dim, inner, bias=True)
        self.add_k_proj = nn.Linear(dim, inner, bias=True)
        self.add_v_proj = nn.Linear(dim, inner, bias=True)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Identity()])
        if not context_pre_only:
            self.to_add_out = nn.Linear(inner, dim)

    def forward(self, hidden_states, encoder_hidden_states):
        b, n, _ = hidden_states.shape

        def split(x):
            return x.view(b, -1, self.heads, self.head_dim).transpose(1, 2)

        q = torch.cat([split(self.to_q(hidden_states)),
                       split(self.add_q_proj(encoder_hidden_states))], dim=2)
        k = torch.cat([split(self.to_k(hidden_states)),
                       split(self.add_k_proj(encoder_hidden_states))], dim=2)
        v = torch.cat([split(self.to_v(hidden_states)),
                       split(self.add_v_proj(encoder_hidden_states))], dim=2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, -1, self.heads * self.head_dim)
        sample, context = out[:, :n], out[:, n:]
        sample = self.to_out[0](sample)
        if self.context_pre_only:
            return sample, None
        return sample, self.to_add_out(context)


class GELUProj(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GELUProj(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class JointTransformerBlock(nn.Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 context_pre_only=False):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = AdaLayerNormZero(dim, dim)
        if context_pre_only:
            self.norm1_context = AdaLayerNormContinuous(dim, dim)
        else:
            self.norm1_context = AdaLayerNormZero(dim, dim)
        self.attn = JointAttention(dim, num_attention_heads, attention_head_dim,
                                   context_pre_only)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.ff_context = FeedForward(dim)

    def forward(self, hidden_states, encoder_hidden_states, temb):
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(hidden_states, temb)
        if self.context_pre_only:
            norm_c = self.norm1_context(encoder_hidden_states, temb)
        else:
            norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
                encoder_hidden_states, temb
            )
        attn_out, context_attn_out = self.attn(norm_h, norm_c)
        hidden_states = hidden_states + gate_msa.unsqueeze(1) * attn_out
        norm_h = self.norm2(hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp.unsqueeze(1) * self.ff(norm_h)
        if self.context_pre_only:
            return None, hidden_states
        encoder_hidden_states = encoder_hidden_states + c_gate_msa.unsqueeze(1) * context_attn_out
        norm_c = self.norm2_context(encoder_hidden_states) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp.unsqueeze(1) * self.ff_context(norm_c)
        return encoder_hidden_states, hidden_states


# --- full models ---------------------------------------------------------------

class SD3TransformerFixture(nn.Module):
    """diffusers SD3Transformer2DModel forward semantics (NCHW in/out)."""

    def __init__(self, sample_size=8, patch_size=2, in_channels=16, num_layers=3,
                 attention_head_dim=16, num_attention_heads=4,
                 joint_attention_dim=32, caption_projection_dim=64,
                 pooled_projection_dim=48, out_channels=16, pos_embed_max_size=12):
        super().__init__()
        dim = num_attention_heads * attention_head_dim
        self.patch_size = patch_size
        self.out_channels = out_channels
        self.num_layers = num_layers
        self.pos_embed = PatchEmbed(sample_size, sample_size, patch_size,
                                    in_channels, dim, pos_embed_max_size)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(dim, pooled_projection_dim)
        self.context_embedder = nn.Linear(joint_attention_dim, caption_projection_dim)
        self.transformer_blocks = nn.ModuleList(
            [
                JointTransformerBlock(dim, num_attention_heads, attention_head_dim,
                                      context_pre_only=(i == num_layers - 1))
                for i in range(num_layers)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(dim, dim)
        self.proj_out = nn.Linear(dim, patch_size * patch_size * out_channels)

    def forward(self, hidden_states, encoder_hidden_states, pooled_projections,
                timestep, block_controlnet_hidden_states=None):
        height, width = hidden_states.shape[-2:]
        hidden_states = self.pos_embed(hidden_states)
        temb = self.time_text_embed(timestep, pooled_projections)
        encoder_hidden_states = self.context_embedder(encoder_hidden_states)
        for i, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                hidden_states, encoder_hidden_states, temb
            )
            if block_controlnet_hidden_states is not None and not block.context_pre_only:
                interval = len(self.transformer_blocks) / len(block_controlnet_hidden_states)
                hidden_states = hidden_states + block_controlnet_hidden_states[int(i / interval)]
        hidden_states = self.norm_out(hidden_states, temb)
        hidden_states = self.proj_out(hidden_states)
        p = self.patch_size
        h, w = height // p, width // p
        hidden_states = hidden_states.reshape(-1, h, w, p, p, self.out_channels)
        hidden_states = torch.einsum("nhwpqc->nchpwq", hidden_states)
        return hidden_states.reshape(-1, self.out_channels, h * p, w * p)


class SD3ControlNetFixture(nn.Module):
    """Reference SD3PromptDiffusionModel forward
    (promptdiffusioncontrolnet_sd3.py:362-483) + encode_support_pair's
    down_proj (:114,189-198)."""

    def __init__(self, sample_size=8, patch_size=2, in_channels=16, num_layers=2,
                 attention_head_dim=16, num_attention_heads=4,
                 joint_attention_dim=32, caption_projection_dim=64,
                 pooled_projection_dim=48, pos_embed_max_size=12):
        super().__init__()
        dim = num_attention_heads * attention_head_dim
        self.down_proj = nn.Conv2d(6, 3, kernel_size=3, padding=1)
        self.pos_embed = PatchEmbed(sample_size, sample_size, patch_size,
                                    in_channels, dim, pos_embed_max_size)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(dim, pooled_projection_dim)
        self.context_embedder = nn.Linear(joint_attention_dim, caption_projection_dim)
        self.transformer_blocks = nn.ModuleList(
            [
                JointTransformerBlock(dim, num_attention_heads, attention_head_dim,
                                      context_pre_only=False)
                for _ in range(num_layers)
            ]
        )
        self.controlnet_blocks = nn.ModuleList(
            [nn.Linear(dim, dim) for _ in range(num_layers)]
        )
        self.pos_embed_input = PatchEmbed(sample_size, sample_size, patch_size,
                                          in_channels, dim, pos_embed_type=None)

    def forward(self, hidden_states, controlnet_cond, controlnet_example_pair_cond,
                encoder_hidden_states, pooled_projections, timestep,
                conditioning_scale=1.0):
        hidden_states = self.pos_embed(hidden_states)
        temb = self.time_text_embed(timestep, pooled_projections)
        encoder_hidden_states = self.context_embedder(encoder_hidden_states)
        hidden_states = (
            hidden_states
            + self.pos_embed_input(controlnet_cond)
            + self.pos_embed_input(controlnet_example_pair_cond)
        )
        samples = []
        for block in self.transformer_blocks:
            encoder_hidden_states, hidden_states = block(
                hidden_states, encoder_hidden_states, temb
            )
            samples.append(hidden_states)
        return [
            cb(s) * conditioning_scale for s, cb in zip(samples, self.controlnet_blocks)
        ]

"""SD3 Prompt-Diffusion ControlNet as a Flax module, NHWC.

Re-expression of `SD3PromptDiffusionModel`
(promptdiffusioncontrolnet_sd3.py:44-483):
  * `down_proj`: 3×3 conv mixing the 6-ch pixel-space support pair
    (condition ‖ image) down to 3 channels before VAE encoding
    (`encode_support_pair`, :189-198 — the VAE encode itself happens in
    the pipeline, which owns the VAE).
  * `pos_embed` on the noisy latents (with the sin-cos grid);
    `pos_embed_input` (zero-init, no pos table) applied to BOTH the query
    cond latent and the pair latent, summed into the stream (:431-440).
  * N JointTransformerBlocks (context_pre_only=False for all).
  * per-block zero-init Linear taps, scaled by conditioning_scale
    (:468-474).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.models.mmdit_sd3 import (
    JointBlock,
    MMDiTConfig,
    PatchEmbed,
    TimestepTextEmbed,
)
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


class SD3ControlNet(nn.Module):
    """Returns the tuple of per-block control residuals (token space)."""

    config: MMDiTConfig = MMDiTConfig(num_layers=12)
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,  # (B, H, W, 16) noisy latents
        timestep: jnp.ndarray,  # (B,)
        cond_latents: jnp.ndarray,  # (B, H, W, 16) VAE-encoded query condition
        pair_latents: jnp.ndarray,  # (B, H, W, 16) encode_support_pair output
        encoder_hidden_states: jnp.ndarray,  # (B, L, joint_attention_dim)
        pooled_projections: jnp.ndarray,  # (B, pooled_projection_dim)
        conditioning_scale: float | jnp.ndarray = 1.0,
    ) -> Tuple[jnp.ndarray, ...]:
        cfg, pol = self.config, self.policy
        p = cfg.patch_size
        b, h, w, _ = latents.shape

        hidden = PatchEmbed(cfg, pol, name="pos_embed")(latents.astype(pol.compute_dtype))
        emb = TimestepTextEmbed(cfg, pol, name="time_text_embed")(timestep, pooled_projections)
        context = nn.Dense(
            cfg.caption_projection_dim, dtype=pol.compute_dtype, param_dtype=jnp.float32,
            name="context_embedder",
        )(encoder_hidden_states.astype(pol.compute_dtype))

        # zero-init patchify (no pos table) shared by cond and pair (:431-440)
        embed_input = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), dtype=pol.compute_dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="pos_embed_input",
        )

        def patchify(x):
            out = embed_input(x.astype(pol.compute_dtype))
            return out.reshape(b, (h // p) * (w // p), cfg.hidden_size)

        hidden = hidden + patchify(cond_latents) + patchify(pair_latents)

        block_cls = nn.remat(JointBlock) if cfg.use_checkpoint else JointBlock
        taps = []
        for i in range(cfg.num_layers):
            hidden, context = block_cls(
                cfg, pol, context_pre_only=False, name=f"blocks_{i}"
            )(hidden, context, emb)
            tap = nn.Dense(
                cfg.hidden_size, dtype=pol.compute_dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                name=f"controlnet_blocks_{i}",
            )(hidden)
            taps.append(tap)

        scale = conditioning_scale
        return tuple(t * scale for t in taps)


class SupportPairDownProj(nn.Module):
    """`down_proj` (6→3 pixel-space conv) applied before VAE-encoding the
    support pair (promptdiffusioncontrolnet_sd3.py:114,189-198)."""

    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, cond: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        pair = jnp.concatenate([cond, gt], axis=-1)  # (B,H,W,6)
        return nn.Conv(
            3, (3, 3), padding=1, dtype=self.policy.compute_dtype,
            param_dtype=jnp.float32, name="down_proj",
        )(pair.astype(self.policy.compute_dtype))

"""Prompt-Diffusion ControlNet (SD1.5) as a Flax module, NHWC.

Re-expression of `cldm.cldm.ControlNet` (cldm/cldm.py:49-327): a trainable
copy of the UNet encoder with
  * `input_hint_block`: 6-channel example pair (condition ‖ image) → 8×
    downsampled, model_channels-wide feature, final conv zero-initialized
    (cldm/cldm.py:147-163);
  * `input_cond_block`: 3-channel query condition through the same conv
    stack (cldm/cldm.py:165-181);
  * `guided_hint = hint(example_pair) + cond(query)` added to the first
    input block's output (cldm/cldm.py:306-313);
  * a 1×1 zero-conv tap after each of the 13 stages (12 input blocks +
    middle), returned as the control residual stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.models.layers import (
    Downsample,
    ResBlock,
    SpatialTransformer,
    TimeEmbedMLP,
    conv1x1,
    conv3x3,
    timestep_embedding,
)
from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


class HintEncoder(nn.Module):
    """8× downsampling conv stack for hint images (cldm/cldm.py:147-181):
    C→16→16→32(s2)→32→96(s2)→96→256(s2)→zero(256→model_channels)."""

    model_channels: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, hint):
        pol = self.policy
        h = hint.astype(pol.compute_dtype)
        widths = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2)]
        for i, (w, s) in enumerate(widths):
            h = conv3x3(w, stride=s, dtype=pol.compute_dtype, name=f"conv_{i}")(h)
            h = jax.nn.silu(h)
        return conv3x3(
            self.model_channels, zero_init=True, dtype=pol.compute_dtype, name="conv_out"
        )(h)


class ControlNetSD15(nn.Module):
    """Returns the 13-residual control stack (index 0..11 = encoder taps,
    index 12 = middle tap), each already scaled by `conditioning_scale`."""

    config: UNetConfig = UNetConfig()
    hint_channels: int = 6
    policy: DTypePolicy = default_policy()

    def _res(self, out_ch, name):
        cls = nn.remat(ResBlock) if self.config.use_checkpoint else ResBlock
        return cls(out_channels=out_ch, policy=self.policy, name=name)

    def _attn(self, ch, name):
        cfg = self.config
        cls = nn.remat(SpatialTransformer) if cfg.use_checkpoint else SpatialTransformer
        return cls(
            heads=cfg.num_heads,
            dim_head=ch // cfg.num_heads,
            depth=cfg.transformer_depth,
            policy=self.policy,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,  # (B, H, W, 4) noisy latents
        timesteps: Optional[jnp.ndarray] = None,  # (B,)
        example_pair: Optional[jnp.ndarray] = None,  # (B, 8H, 8W, 6) hint pair
        query: Optional[jnp.ndarray] = None,  # (B, 8H, 8W, 3) query condition
        context: Optional[jnp.ndarray] = None,  # (B, L, context_dim)
        conditioning_scale: float | jnp.ndarray = 1.0,
        guided_hint: Optional[jnp.ndarray] = None,  # precomputed hint sum
        hint_only: bool = False,
    ) -> Tuple[jnp.ndarray, ...]:
        """Full control stack, or — with `hint_only=True` — just the summed
        hint embedding. The hint is t- and x-independent (cldm/cldm.py:
        302-312), so samplers hoist it out of the denoise loop and pass it
        back via `guided_hint` (saves ~8 hint convs × 2 encoders × steps)."""
        cfg = self.config
        pol = self.policy

        if guided_hint is None:
            pair_hint = HintEncoder(cfg.model_channels, pol, name="input_hint_block")(example_pair)
            query_hint = HintEncoder(cfg.model_channels, pol, name="input_cond_block")(query)
            guided_hint = pair_hint + query_hint
        if hint_only:
            return guided_hint

        x = x.astype(pol.compute_dtype)
        context = context.astype(pol.compute_dtype)
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimeEmbedMLP(embed_dim=cfg.model_channels * 4, policy=pol, name="time_embed")(
            t_emb.astype(pol.compute_dtype)
        )

        enc_plan, _, mid_ch, _ = cfg.encoder_plan()

        outs = []
        h = x
        for i, (kind, out_ch, has_attn) in enumerate(enc_plan):
            if kind == "conv":
                h = conv3x3(out_ch, dtype=pol.compute_dtype, name=f"input_blocks_{i}_conv", policy=pol)(h)
                h = h + guided_hint  # injected once, after conv_in (cldm.py:310-312)
            elif kind == "res":
                h = self._res(out_ch, f"input_blocks_{i}_res")(h, emb)
                if has_attn:
                    h = self._attn(out_ch, f"input_blocks_{i}_attn")(h, context)
            elif kind == "down":
                h = Downsample(out_channels=out_ch, policy=pol, name=f"input_blocks_{i}_down")(h)
            outs.append(
                conv1x1(out_ch, zero_init=True, dtype=pol.compute_dtype, name=f"zero_convs_{i}")(h)
            )

        h = self._res(mid_ch, "middle_block_0")(h, emb)
        h = self._attn(mid_ch, "middle_block_1")(h, context)
        h = self._res(mid_ch, "middle_block_2")(h, emb)
        outs.append(
            conv1x1(mid_ch, zero_init=True, dtype=pol.compute_dtype, name="middle_block_out")(h)
        )

        scale = conditioning_scale
        if isinstance(scale, (tuple, list)) or getattr(scale, "ndim", None) == 1:
            # per-tap scales, e.g. guess-mode decay 0.825^(12−i) (notebook cell 5)
            return tuple(o * s for o, s in zip(outs, scale))
        # one scalar (python or traced) for every tap
        return tuple(o * scale for o in outs)

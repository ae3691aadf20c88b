"""SD1.5 UNet (the ε-predictor) as a Flax module, NHWC.

Re-expression of `UNetModel`/`ControlledUnetModel`
(ldm/modules/diffusionmodules/openaimodel.py:412-786, cldm/cldm.py:22-45):
timestep sin-embed → MLP; 12 input blocks; middle (res, transformer, res);
12 output blocks with skip concat; GN+SiLU+zero-conv head. Control residuals
from the ControlNet are consumed exactly like the reference: the middle
residual adds to the bottleneck, the 12 encoder residuals add to the skip
connections in reverse order.

Block indices in parameter names (`input_blocks_4_res` …) match the torch
module indices one-to-one for mechanical checkpoint import.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.models.layers import (
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    Downsample,
    Upsample,
    TimeEmbedMLP,
    conv3x3,
    timestep_embedding,
)
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors models/cldm_v15.yaml:47-62."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    use_checkpoint: bool = False  # rematerialize blocks under grad
    # FreeU (pipeline_prompt_diffusion.py:809-835): backbone/skip feature
    # rescaling at the two deepest decoder levels; None disables.
    freeu: Optional[Tuple[float, float, float, float]] = None  # (s1, s2, b1, b2)

    def encoder_plan(self):
        """Sequence of ('conv'|'res'|'down', out_ch, has_attn) per torch
        input_blocks index, plus the per-block output channel list."""
        plan = [("conv", self.model_channels, False)]
        chans = [self.model_channels]
        ch, ds = self.model_channels, 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                plan.append(("res", ch, ds in self.attention_resolutions))
                chans.append(ch)
            if level != len(self.channel_mult) - 1:
                plan.append(("down", ch, False))
                chans.append(ch)
                ds *= 2
        return plan, chans, ch, ds

    def decoder_plan(self, encoder_chans, ds):
        """('res', out_ch, has_attn, has_up) per torch output_blocks index."""
        chans = list(encoder_chans)
        plan = []
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                chans.pop()
                ch = self.model_channels * mult
                has_attn = ds in self.attention_resolutions
                has_up = level > 0 and i == self.num_res_blocks
                plan.append(("res", ch, has_attn, has_up))
                if has_up:
                    ds //= 2
        return plan


def _freeu_filter(skip: jnp.ndarray, scale: float, threshold: int = 1) -> jnp.ndarray:
    """Fourier low-frequency damping of skip features (diffusers
    fourier_filter used by FreeU)."""
    x = skip.astype(jnp.float32)
    freq = jnp.fft.fftn(x, axes=(1, 2))
    freq = jnp.fft.fftshift(freq, axes=(1, 2))
    b, h, w, c = x.shape
    ch, cw = h // 2, w // 2
    yy = jnp.abs(jnp.arange(h) - ch)[:, None]
    xx = jnp.abs(jnp.arange(w) - cw)[None, :]
    mask = jnp.where((yy <= threshold) & (xx <= threshold), scale, 1.0)
    freq = freq * mask[None, :, :, None]
    freq = jnp.fft.ifftshift(freq, axes=(1, 2))
    return jnp.real(jnp.fft.ifftn(freq, axes=(1, 2))).astype(skip.dtype)


class UNetSD15(nn.Module):
    config: UNetConfig = UNetConfig()
    policy: DTypePolicy = default_policy()

    def _res(self, out_ch, name):
        cls = nn.remat(ResBlock) if self.config.use_checkpoint else ResBlock
        return cls(out_channels=out_ch, policy=self.policy, name=name)

    def _attn(self, ch, name):
        cfg = self.config
        cls = nn.remat(SpatialTransformer, static_argnums=()) if cfg.use_checkpoint else SpatialTransformer
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
        x: jnp.ndarray,  # (B, H, W, C) latents, NHWC
        timesteps: jnp.ndarray,  # (B,)
        context: jnp.ndarray,  # (B, L, context_dim)
        control: Optional[Sequence[jnp.ndarray]] = None,  # 13 residuals (NHWC)
        only_mid_control: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        pol = self.policy
        x = x.astype(pol.compute_dtype)
        context = context.astype(pol.compute_dtype)

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimeEmbedMLP(embed_dim=cfg.model_channels * 4, policy=pol, name="time_embed")(
            t_emb.astype(pol.compute_dtype)
        )

        enc_plan, _, mid_ch, _ = cfg.encoder_plan()
        ds_final = 2 ** (len(cfg.channel_mult) - 1)

        hs = []
        h = x
        for i, (kind, out_ch, has_attn) in enumerate(enc_plan):
            if kind == "conv":
                h = conv3x3(out_ch, dtype=pol.compute_dtype, name=f"input_blocks_{i}_conv", policy=pol)(h)
            elif kind == "res":
                h = self._res(out_ch, f"input_blocks_{i}_res")(h, emb)
                if has_attn:
                    h = self._attn(out_ch, f"input_blocks_{i}_attn")(h, context)
            elif kind == "down":
                h = Downsample(out_channels=out_ch, policy=pol, name=f"input_blocks_{i}_down")(h)
            hs.append(h)

        h = self._res(mid_ch, "middle_block_0")(h, emb)
        h = self._attn(mid_ch, "middle_block_1")(h, context)
        h = self._res(mid_ch, "middle_block_2")(h, emb)

        ctrl = list(control) if control is not None else None
        if ctrl is not None:
            h = h + ctrl.pop().astype(h.dtype)

        _, enc_chans, _, _ = cfg.encoder_plan()
        dec_plan = cfg.decoder_plan(enc_chans, ds_final)
        for i, (kind, out_ch, has_attn, has_up) in enumerate(dec_plan):
            skip = hs.pop()
            if ctrl is not None and not only_mid_control:
                skip = skip + ctrl.pop().astype(skip.dtype)
            if cfg.freeu is not None:
                s1, s2, b1, b2 = cfg.freeu
                mc = cfg.model_channels
                if h.shape[-1] == 4 * mc:  # deepest decoder level
                    half = h.shape[-1] // 2
                    h = jnp.concatenate([h[..., :half] * b1, h[..., half:]], -1)
                    skip = _freeu_filter(skip, s1)
                elif h.shape[-1] == 2 * mc:
                    half = h.shape[-1] // 2
                    h = jnp.concatenate([h[..., :half] * b2, h[..., half:]], -1)
                    skip = _freeu_filter(skip, s2)
            h = jnp.concatenate([h, skip], axis=-1)
            h = self._res(out_ch, f"output_blocks_{i}_res")(h, emb)
            if has_attn:
                h = self._attn(out_ch, f"output_blocks_{i}_attn")(h, context)
            if has_up:
                h = Upsample(out_channels=out_ch, policy=pol, name=f"output_blocks_{i}_up")(h)

        h = GroupNorm32(apply_silu=True, name="out_norm")(h)
        h = conv3x3(cfg.out_channels, zero_init=True, dtype=pol.compute_dtype, name="out_conv")(h)
        return h.astype(jnp.float32)

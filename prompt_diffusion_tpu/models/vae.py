"""KL-VAE first stage (AutoencoderKL) as Flax modules, NHWC.

Re-expression of `ldm/models/autoencoder.py:13-219` +
`ldm/modules/diffusionmodules/model.py` (Encoder :452, Decoder :546,
ResnetBlock :90, AttnBlock :152): ch=128, mult (1,2,4,4), 2 res blocks,
single-head spatial attention at the bottleneck, z=4 with double_z moments.

Latents scale by 0.18215 (ddpm.py:655-662) — handled by the pipeline, not
here, to mirror the reference split of responsibilities.

int8 serving: constructing with `policy=int8_policy()` routes the interior
3×3/1×1 convs through QuantConv (ops/quant.py → Pallas int8 conv). The
pixel/latent boundary convs (conv_in on pixels, encoder conv_out, decoder
conv_out) stay bf16 for exact I/O numerics. Default policy keeps the whole
VAE bf16 — it is off the denoise hot loop, so this is a wall-clock lever
for the once-per-generate decode only.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.models.layers import GroupNorm32, conv1x1, conv3x3
from prompt_diffusion_tpu.ops.attention import dot_product_attention
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Mirrors models/cldm_v15.yaml:64-85 ddconfig."""

    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    double_z: bool = True
    scale_factor: float = 0.18215
    shift_factor: float = 0.0  # SD3 VAE uses 0.0609; SD1.5 uses 0


class VAEResnetBlock(nn.Module):
    """GN(eps1e-6)→swish→conv ×2 + residual (model.py:90-149); no t-emb."""

    out_channels: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        pol = self.policy
        q8 = pol.quant == "int8"
        # int8 mode: the GN kernel's fused epilogue emits (int8, scale)
        # straight into the QuantConv — same pattern as the UNet ResBlock
        h = GroupNorm32(eps=1e-6, apply_silu=True, quant_out=q8, name="norm1")(x)
        h = conv3x3(self.out_channels, dtype=pol.compute_dtype, policy=pol, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, apply_silu=True, quant_out=q8, name="norm2")(h)
        h = conv3x3(self.out_channels, dtype=pol.compute_dtype, policy=pol, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, dtype=pol.compute_dtype, policy=pol, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:152-203)."""

    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pol = self.policy
        # int8 mode: quantize the GN output ONCE for all three q/k/v convs
        hn = GroupNorm32(eps=1e-6, quant_out=pol.quant == "int8", name="norm")(x)
        q = conv1x1(c, dtype=pol.compute_dtype, policy=pol, name="q")(hn).reshape(b, h * w, 1, c)
        k = conv1x1(c, dtype=pol.compute_dtype, policy=pol, name="k")(hn).reshape(b, h * w, 1, c)
        v = conv1x1(c, dtype=pol.compute_dtype, policy=pol, name="v")(hn).reshape(b, h * w, 1, c)
        out = dot_product_attention(q, k, v, softmax_dtype=pol.softmax_dtype)
        out = out.reshape(b, h, w, c)
        out = conv1x1(c, dtype=pol.compute_dtype, policy=pol, name="proj_out")(out)
        return x + out


class VAEEncoder(nn.Module):
    config: VAEConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        cfg, pol = self.config, self.policy
        x = x.astype(pol.compute_dtype)
        # conv_in consumes raw pixels (3ch) — negligible FLOPs, stays bf16
        h = conv3x3(cfg.ch, dtype=pol.compute_dtype, name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            out_ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(out_ch, pol, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric (0,1) pad + stride-2 valid conv (model.py:133-139)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name=f"down_{level}_downsample",
                )(h)
        h = VAEResnetBlock(h.shape[-1], pol, name="mid_block_1")(h)
        h = VAEAttnBlock(pol, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], pol, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, apply_silu=True, name="norm_out")(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        # conv_out emits the z moments — keep exact bf16 numerics
        return conv3x3(out_c, dtype=pol.compute_dtype, name="conv_out")(h)


class VAEDecoder(nn.Module):
    config: VAEConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, z):
        cfg, pol = self.config, self.policy
        z = z.astype(pol.compute_dtype)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = conv3x3(block_in, dtype=pol.compute_dtype, policy=pol, name="conv_in")(z)
        h = VAEResnetBlock(block_in, pol, name="mid_block_1")(h)
        h = VAEAttnBlock(pol, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, pol, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(out_ch, pol, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = conv3x3(c, dtype=pol.compute_dtype, policy=pol,
                            name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, apply_silu=True, name="norm_out")(h)
        # conv_out writes pixels — keep exact bf16 numerics at the output
        return conv3x3(cfg.out_channels, dtype=pol.compute_dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode → (quant_conv) moments; decode ← (post_quant_conv) z
    (autoencoder.py:13-91)."""

    config: VAEConfig = VAEConfig()
    policy: DTypePolicy = default_policy()

    def setup(self):
        self.encoder = VAEEncoder(self.config, self.policy)
        self.decoder = VAEDecoder(self.config, self.policy)
        zc = self.config.z_channels
        self.quant_conv = conv1x1(2 * zc if self.config.double_z else zc,
                                  dtype=self.policy.compute_dtype, name="quant_conv")
        self.post_quant_conv = conv1x1(zc, dtype=self.policy.compute_dtype, name="post_quant_conv")

    def encode_moments(self, x):
        """(B,H,W,3) → (B,H/8,W/8,2z) [mean | logvar]."""
        return self.quant_conv(self.encoder(x)).astype(jnp.float32)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z.astype(self.policy.compute_dtype))).astype(
            jnp.float32
        )

    def __call__(self, x, rng=None, sample: bool = False):
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar


def sample_from_moments(moments: jnp.ndarray, rng) -> jnp.ndarray:
    """DiagonalGaussianDistribution.sample (distributions.py:24-42)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

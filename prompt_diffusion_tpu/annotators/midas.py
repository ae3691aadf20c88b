"""MiDaS DPT monocular depth + surface normals, as batched Flax modules.

Re-expression of `annotator/midas/` (MidasDetector `__init__.py:9-38`, DPT
`midas/dpt_depth.py`, ViT backbone `midas/vit.py`, fusion blocks
`midas/blocks.py`): a ViT backbone with 4 hook taps → readout-project →
reassemble (per-stage resample to a feature pyramid) → 4 RefineNet-style
fusion blocks → monotone depth head.

This implementation is the **DPT-Large** variant (vitl16_384, hooks
[5,11,17,23]) — pure ViT, no timm ResNet hybrid stage — with the same
DPT decoder the reference uses for all variants. The detector API matches
the reference: relative depth normalized to [0,1] plus normals from Sobel
gradients (`__init__.py:28-36`), but batched and jittable.

Weight import (`import_dpt_checkpoint`) reads the official dpt_large ckpt.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.ops.attention import dot_product_attention
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    reassemble_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256
    pos_grid: int = 24  # 384/16 training grid


class ViTBlock(nn.Module):
    cfg: DPTConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        cfg, pol = self.cfg, self.policy
        d = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=pol.norm_dtype, name="norm1")(x).astype(x.dtype)
        qkv = nn.Dense(3 * cfg.hidden_size, dtype=pol.compute_dtype,
                       param_dtype=jnp.float32, name="qkv")(h)
        b, n, _ = h.shape
        q, k, v = [t.reshape(b, n, cfg.num_heads, d) for t in jnp.split(qkv, 3, axis=-1)]
        attn = dot_product_attention(q, k, v, softmax_dtype=pol.softmax_dtype)
        x = x + nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype,
                         param_dtype=jnp.float32, name="proj")(attn.reshape(b, n, -1))
        h = nn.LayerNorm(epsilon=1e-6, dtype=pol.norm_dtype, name="norm2")(x).astype(x.dtype)
        h = nn.Dense(cfg.mlp_ratio * cfg.hidden_size, dtype=pol.compute_dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    features: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        return x + h


def _resize_align_corners(x, new_h, new_w):
    """bilinear, align_corners=True (torch F.interpolate semantics used by
    the DPT decoder)."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, new_h)
    xs = jnp.linspace(0.0, w - 1.0, new_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y1, x0) * wy * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x1) * wy * wx
    )
    return out


class FeatureFusion(nn.Module):
    """FeatureFusionBlock_custom (blocks.py:291-334): optional skip through
    RCU1, then RCU2, 2× align-corners upsample, 1×1 out conv."""

    features: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.policy, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.policy, name="rcu2")(x)
        b, h, w, c = x.shape
        x = _resize_align_corners(x, h * 2, w * 2)
        return nn.Conv(self.features, (1, 1), dtype=self.policy.compute_dtype,
                       param_dtype=jnp.float32, name="out_conv")(x)


class DPTDepth(nn.Module):
    """(B,H,W,3) in [-1,1] → (B,H,W) relative inverse depth (≥0)."""

    config: DPTConfig = DPTConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        cfg, pol = self.config, self.policy
        b, H, W, _ = img.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p

        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), dtype=pol.compute_dtype,
                    param_dtype=jnp.float32, name="patch_embed")(img.astype(pol.compute_dtype))
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.pos_grid * cfg.pos_grid + 1, cfg.hidden_size), jnp.float32)
        # resize the grid part of the pos embed to the input grid (vit.py's
        # _resize_pos_embed)
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(1, cfg.pos_grid, cfg.pos_grid, cfg.hidden_size)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, cfg.hidden_size), "bilinear")
        pos_grid = pos_grid.reshape(1, gh * gw, cfg.hidden_size)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(x.dtype), x], axis=1)
        x = x + jnp.concatenate([pos_cls, pos_grid], axis=1).astype(x.dtype)

        taps = []
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, pol, name=f"blocks_{i}")(x)
            if i in cfg.hooks:
                taps.append(x)

        # readout "project": cat(token, cls) → Linear(2D→D) + GELU
        pyramid = []
        for s, tap in enumerate(taps):
            tokens, cls_t = tap[:, 1:], tap[:, :1]
            t = jnp.concatenate([tokens, jnp.broadcast_to(cls_t, tokens.shape)], axis=-1)
            t = nn.Dense(cfg.hidden_size, dtype=pol.compute_dtype, param_dtype=jnp.float32,
                         name=f"readout_{s}")(t)
            t = jax.nn.gelu(t, approximate=False)
            t = t.reshape(b, gh, gw, cfg.hidden_size)
            t = nn.Conv(cfg.reassemble_dims[s], (1, 1), dtype=pol.compute_dtype,
                        param_dtype=jnp.float32, name=f"reassemble_proj_{s}")(t)
            # per-stage resample: 4x, 2x, 1x, 0.5x (vit.py _make_vit_b16 stages)
            if s == 0:
                t = nn.ConvTranspose(cfg.reassemble_dims[s], (4, 4), strides=(4, 4),
                                     dtype=pol.compute_dtype, param_dtype=jnp.float32,
                                     name="resample_0")(t)
            elif s == 1:
                t = nn.ConvTranspose(cfg.reassemble_dims[s], (2, 2), strides=(2, 2),
                                     dtype=pol.compute_dtype, param_dtype=jnp.float32,
                                     name="resample_1")(t)
            elif s == 3:
                t = nn.Conv(cfg.reassemble_dims[s], (3, 3), strides=(2, 2), padding=1,
                            dtype=pol.compute_dtype, param_dtype=jnp.float32,
                            name="resample_3")(t)
            # scratch layerN_rn: 3x3 conv → features (no bias)
            t = nn.Conv(cfg.features, (3, 3), padding=1, use_bias=False,
                        dtype=pol.compute_dtype, param_dtype=jnp.float32,
                        name=f"scratch_rn_{s}")(t)
            pyramid.append(t)

        f4, f8, f16, f32 = pyramid
        h = FeatureFusion(cfg.features, pol, name="refinenet4")(f32)
        h = FeatureFusion(cfg.features, pol, name="refinenet3")(h, f16)
        h = FeatureFusion(cfg.features, pol, name="refinenet2")(h, f8)
        h = FeatureFusion(cfg.features, pol, name="refinenet1")(h, f4)

        h = nn.Conv(cfg.features // 2, (3, 3), padding=1, dtype=pol.compute_dtype,
                    param_dtype=jnp.float32, name="head_conv1")(h)
        bh, hh, hw, _ = h.shape
        h = _resize_align_corners(h, hh * 2, hw * 2)
        h = nn.Conv(32, (3, 3), padding=1, dtype=pol.compute_dtype,
                    param_dtype=jnp.float32, name="head_conv2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name="head_conv3")(h)
        h = jax.nn.relu(h)
        return h[..., 0].astype(jnp.float32)


def depth_to_normals(depth: jnp.ndarray, a: float = 2 * np.pi, bg_th: float = 0.1):
    """Batched port of MidasDetector.__call__ post-processing
    (annotator/midas/__init__.py:22-37). depth: (B,H,W) raw inverse depth.
    Returns (depth01, normals01) both in [0,1] float."""
    dmin = depth.min(axis=(1, 2), keepdims=True)
    dmax = depth.max(axis=(1, 2), keepdims=True)
    depth01 = (depth - dmin) / jnp.maximum(dmax - dmin, 1e-8)

    sobel_x = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sobel_y = sobel_x.T

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img[..., None], k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    gx = conv(depth, sobel_x)
    gy = conv(depth, sobel_y)
    mask = depth01 >= bg_th
    gx = gx * mask
    gy = gy * mask
    z = jnp.full_like(gx, a)
    normal = jnp.stack([gx, gy, z], axis=-1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return depth01, jnp.clip(normal * 0.5 + 0.5, 0.0, 1.0)


def import_dpt_checkpoint(path: str, cfg: DPTConfig = DPTConfig()) -> dict:
    """Official dpt_large-midas checkpoint → flax params."""
    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    conv = lambda w: w.transpose(2, 3, 1, 0)
    lin = lambda w: w.T
    p: dict = {
        "patch_embed": {"kernel": conv(sd["pretrained.model.patch_embed.proj.weight"]),
                        "bias": sd["pretrained.model.patch_embed.proj.bias"]},
        "cls_token": sd["pretrained.model.cls_token"],
        "pos_embed": sd["pretrained.model.pos_embed"],
    }
    for i in range(cfg.num_layers):
        t = f"pretrained.model.blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {"scale": sd[f"{t}.norm1.weight"], "bias": sd[f"{t}.norm1.bias"]},
            "norm2": {"scale": sd[f"{t}.norm2.weight"], "bias": sd[f"{t}.norm2.bias"]},
            "qkv": {"kernel": lin(sd[f"{t}.attn.qkv.weight"]), "bias": sd[f"{t}.attn.qkv.bias"]},
            "proj": {"kernel": lin(sd[f"{t}.attn.proj.weight"]), "bias": sd[f"{t}.attn.proj.bias"]},
            "fc1": {"kernel": lin(sd[f"{t}.mlp.fc1.weight"]), "bias": sd[f"{t}.mlp.fc1.bias"]},
            "fc2": {"kernel": lin(sd[f"{t}.mlp.fc2.weight"]), "bias": sd[f"{t}.mlp.fc2.bias"]},
        }
    for s in range(4):
        act = f"pretrained.act_postprocess{s + 1}"
        p[f"readout_{s}"] = {"kernel": lin(sd[f"{act}.0.project.0.weight"]),
                             "bias": sd[f"{act}.0.project.0.bias"]}
        p[f"reassemble_proj_{s}"] = {"kernel": conv(sd[f"{act}.3.weight"]),
                                     "bias": sd[f"{act}.3.bias"]}
        if s in (0, 1, 3):
            w = sd[f"{act}.4.weight"]
            # ConvTranspose in torch: (in, out, kh, kw) → flax (kh, kw, in, out);
            # plain conv (stage 3): (out, in, kh, kw)
            kern = w.transpose(2, 3, 0, 1) if s in (0, 1) else conv(w)
            p[f"resample_{s}"] = {"kernel": kern, "bias": sd[f"{act}.4.bias"]}
        p[f"scratch_rn_{s}"] = {"kernel": conv(sd[f"scratch.layer{s + 1}_rn.weight"])}
    for rn in range(1, 5):
        t = f"scratch.refinenet{rn}"
        p[f"refinenet{rn}"] = {
            "rcu1": {"conv1": {"kernel": conv(sd[f"{t}.resConfUnit1.conv1.weight"]),
                               "bias": sd[f"{t}.resConfUnit1.conv1.bias"]},
                     "conv2": {"kernel": conv(sd[f"{t}.resConfUnit1.conv2.weight"]),
                               "bias": sd[f"{t}.resConfUnit1.conv2.bias"]}},
            "rcu2": {"conv1": {"kernel": conv(sd[f"{t}.resConfUnit2.conv1.weight"]),
                               "bias": sd[f"{t}.resConfUnit2.conv1.bias"]},
                     "conv2": {"kernel": conv(sd[f"{t}.resConfUnit2.conv2.weight"]),
                               "bias": sd[f"{t}.resConfUnit2.conv2.bias"]}},
            "out_conv": {"kernel": conv(sd[f"{t}.out_conv.weight"]),
                         "bias": sd[f"{t}.out_conv.bias"]},
        }
    p["head_conv1"] = {"kernel": conv(sd["scratch.output_conv.0.weight"]),
                       "bias": sd["scratch.output_conv.0.bias"]}
    p["head_conv2"] = {"kernel": conv(sd["scratch.output_conv.2.weight"]),
                       "bias": sd["scratch.output_conv.2.bias"]}
    p["head_conv3"] = {"kernel": conv(sd["scratch.output_conv.4.weight"]),
                       "bias": sd["scratch.output_conv.4.bias"]}
    return {"params": p}

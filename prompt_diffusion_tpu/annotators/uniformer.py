"""UniFormer-S + UperNet ADE20k semantic segmentation, as Flax modules.

Replaces the reference's 43k-LoC vendored mmcv/mmseg tree
(`annotator/uniformer/`, UniformerDetector `__init__.py:11-23`) with the
~400 LoC that the inference path actually exercises:

  * UniFormer-S backbone (mmseg/models/backbones/uniformer.py:243-):
    4 stages, embed dims (64,128,320,512), depths (3,4,8,3), head_dim 64;
    stages 1-2 use convolutional CBlocks (depthwise pos-embed conv 3×3,
    BN → 1×1 → depthwise 5×5 → 1×1, BN → conv-MLP), stages 3-4 use
    SABlocks (depthwise pos-embed, LN → MHSA → LN → MLP); per-stage
    patch-embed convs (4,2,2,2) each followed by LayerNorm.
  * UperNet decode head (mmseg UPerHead): PSP pooling (1,2,3,6) on the
    last stage, FPN lateral/top-down fusion, 3×3 fpn convs, concat →
    bottleneck → 1×1 classifier (150 ADE classes). ConvModule = conv
    (no bias) + BN (inference stats) + ReLU.
  * ADE20k palette rendering (the seg *image* is the model conditioning
    input downstream, so pixel-exact palette colors matter).

BatchNorms run in inference mode from imported running stats.
Preprocessing matches mmseg: ImageNet mean/std on RGB uint8.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.ops.attention import dot_product_attention
from prompt_diffusion_tpu.ops.resize import resize_bilinear
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class UniFormerConfig:
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 4, 8, 3)
    head_dim: int = 64
    mlp_ratio: int = 4
    num_classes: int = 150
    decode_channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)


class InferenceBN(nn.Module):
    """BatchNorm in inference mode (running stats imported as params)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(x.dtype)


def _dwconv(x, features, kernel, name_scope, policy):
    return nn.Conv(features, (kernel, kernel), padding=kernel // 2,
                   feature_group_count=features, dtype=policy.compute_dtype,
                   param_dtype=jnp.float32, name=name_scope)(x)


class CBlock(nn.Module):
    """Convolutional block for stages 1-2 (uniformer.py:62-81)."""

    dim: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        pol = self.policy
        x = x + _dwconv(x, self.dim, 3, "pos_embed", pol)
        h = InferenceBN(name="norm1")(x)
        h = nn.Conv(self.dim, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name="conv1")(h)
        h = _dwconv(h, self.dim, 5, "attn", pol)
        h = nn.Conv(self.dim, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name="conv2")(h)
        x = x + h
        h = InferenceBN(name="norm2")(x)
        h = nn.Conv(self.dim * 4, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Conv(self.dim, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name="mlp_fc2")(h)
        return x + h


class SABlock(nn.Module):
    """Self-attention block for stages 3-4 (uniformer.py:112-135)."""

    dim: int
    num_heads: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        pol = self.policy
        x = x + _dwconv(x, self.dim, 3, "pos_embed", pol)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        from prompt_diffusion_tpu.annotators.midas import _vit_attention, _vit_dense
        from prompt_diffusion_tpu.models.layers import FusedLayerNorm

        dense = _vit_dense(pol)
        quant = pol.quant == "int8" and jax.default_backend() != "cpu"
        hn = FusedLayerNorm(eps=1e-6, quant_out=quant, name="norm1")(t)
        qkv = dense(3 * c, "qkv")(hn)
        attn = _vit_attention(qkv, self.num_heads, pol)
        t = t + dense(c, "proj")(attn.reshape(b, h * w, c))
        hn = FusedLayerNorm(eps=1e-6, quant_out=quant, name="norm2")(t)
        hn = dense(4 * c, "mlp_fc1")(hn)
        hn = jax.nn.gelu(hn, approximate=False)
        hn = dense(c, "mlp_fc2")(hn)
        t = t + hn
        return t.reshape(b, h, w, c)


class UniFormerBackbone(nn.Module):
    config: UniFormerConfig = UniFormerConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        cfg, pol = self.config, self.policy
        outs = []
        for stage in range(4):
            p = 4 if stage == 0 else 2
            x = nn.Conv(cfg.embed_dims[stage], (p, p), strides=(p, p),
                        dtype=pol.compute_dtype, param_dtype=jnp.float32,
                        name=f"patch_embed{stage + 1}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=pol.norm_dtype,
                             name=f"patch_norm{stage + 1}")(x).astype(x.dtype)
            for i in range(cfg.depths[stage]):
                if stage < 2:
                    x = CBlock(cfg.embed_dims[stage], pol, name=f"blocks{stage + 1}_{i}")(x)
                else:
                    heads = cfg.embed_dims[stage] // cfg.head_dim
                    x = SABlock(cfg.embed_dims[stage], heads, pol,
                                name=f"blocks{stage + 1}_{i}")(x)
            out = nn.LayerNorm(epsilon=1e-6, dtype=pol.norm_dtype,
                               name=f"norm{stage + 1}")(x).astype(x.dtype)
            outs.append(out)
        return outs


class ConvModule(nn.Module):
    features: int
    kernel: int
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = InferenceBN(name="bn")(x)
        return jax.nn.relu(x)


class UPerHead(nn.Module):
    config: UniFormerConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, feats):
        cfg, pol = self.config, self.policy
        ch = cfg.decode_channels
        f4 = feats[-1]
        b, h4, w4, _ = f4.shape

        # PSP on the last stage
        psp_outs = [f4]
        for si, scale in enumerate(cfg.pool_scales):
            pooled = _adaptive_avg_pool(f4, scale)
            pooled = ConvModule(ch, 1, pol, name=f"psp_{si}")(pooled)
            psp_outs.append(resize_bilinear(pooled, h4, w4))
        psp = ConvModule(ch, 3, pol, name="psp_bottleneck")(jnp.concatenate(psp_outs, -1))

        # FPN
        laterals = [
            ConvModule(ch, 1, pol, name=f"lateral_{i}")(feats[i]) for i in range(3)
        ] + [psp]
        for i in range(2, -1, -1):
            up = resize_bilinear(laterals[i + 1], *laterals[i].shape[1:3])
            laterals[i] = laterals[i] + up
        fpn_outs = [
            ConvModule(ch, 3, pol, name=f"fpn_{i}")(laterals[i]) for i in range(3)
        ] + [laterals[3]]
        target = fpn_outs[0].shape
        fpn_outs = [resize_bilinear(f, target[1], target[2]) for f in fpn_outs]
        fused = ConvModule(ch, 3, pol, name="fpn_bottleneck")(jnp.concatenate(fpn_outs, -1))
        logits = nn.Conv(cfg.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="conv_seg")(fused)
        return logits  # (B, H/4, W/4, 150)


def _adaptive_avg_pool(x, out_size: int):
    """torch AdaptiveAvgPool2d semantics for square outputs."""
    import math

    b, h, w, c = x.shape
    rows = []
    for i in range(out_size):
        y0, y1 = (i * h) // out_size, math.ceil((i + 1) * h / out_size)
        cols = []
        for j in range(out_size):
            x0, x1 = (j * w) // out_size, math.ceil((j + 1) * w / out_size)
            cols.append(x[:, y0:y1, x0:x1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


class UniFormerSeg(nn.Module):
    """(B,H,W,3) RGB float [0,255] → per-pixel class logits at input res."""

    config: UniFormerConfig = UniFormerConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, images):
        x = (images.astype(jnp.float32) - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        feats = UniFormerBackbone(self.config, self.policy, name="backbone")(
            x.astype(self.policy.compute_dtype))
        logits = UPerHead(self.config, self.policy, name="decode_head")(feats)
        # the 150-class logit upsample to input res is the single most
        # expensive op in the net (26 ms/trip at batch 16 as an fp32
        # jax.image.resize fusion, docs/evidence/q5/trace_ann.log) — run it
        # as MXU matmuls in the compute dtype; downstream consumers argmax,
        # for which bf16 logit rounding is immaterial
        return resize_bilinear(logits.astype(self.policy.compute_dtype),
                               *images.shape[1:3])


def ade_palette() -> np.ndarray:
    """Standard ADE20K 150-class palette (public dataset constant)."""
    return np.asarray([
        [120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50],
        [4, 200, 3], [120, 120, 80], [140, 140, 140], [204, 5, 255],
        [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
        [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
        [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
        [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
        [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220],
        [255, 9, 92], [112, 9, 255], [8, 255, 214], [7, 255, 224],
        [255, 184, 6], [10, 255, 71], [255, 41, 10], [7, 255, 255],
        [224, 255, 8], [102, 8, 255], [255, 61, 6], [255, 194, 7],
        [255, 122, 8], [0, 255, 20], [255, 8, 41], [255, 5, 153],
        [6, 51, 255], [235, 12, 255], [160, 150, 20], [0, 163, 255],
        [140, 140, 140], [250, 10, 15], [20, 255, 0], [31, 255, 0],
        [255, 31, 0], [255, 224, 0], [153, 255, 0], [0, 0, 255],
        [255, 71, 0], [0, 235, 255], [0, 173, 255], [31, 0, 255],
        [11, 200, 200], [255, 82, 0], [0, 255, 245], [0, 61, 255],
        [0, 255, 112], [0, 255, 133], [255, 0, 0], [255, 163, 0],
        [255, 102, 0], [194, 255, 0], [0, 143, 255], [51, 255, 0],
        [0, 82, 255], [0, 255, 41], [0, 255, 173], [10, 0, 255],
        [173, 255, 0], [0, 255, 153], [255, 92, 0], [255, 0, 255],
        [255, 0, 245], [255, 0, 102], [255, 173, 0], [255, 0, 20],
        [255, 184, 184], [0, 31, 255], [0, 255, 61], [0, 71, 255],
        [255, 0, 204], [0, 255, 194], [0, 255, 82], [0, 10, 255],
        [0, 112, 255], [51, 0, 255], [0, 194, 255], [0, 122, 255],
        [0, 255, 163], [255, 153, 0], [0, 255, 10], [255, 112, 0],
        [143, 255, 0], [82, 0, 255], [163, 255, 0], [255, 235, 0],
        [8, 184, 170], [133, 0, 255], [0, 255, 92], [184, 0, 255],
        [255, 0, 31], [0, 184, 255], [0, 214, 255], [255, 0, 112],
        [92, 255, 0], [0, 224, 255], [112, 224, 255], [70, 184, 160],
        [163, 0, 255], [153, 0, 255], [71, 255, 0], [255, 0, 163],
        [255, 204, 0], [255, 0, 143], [0, 255, 235], [133, 255, 0],
        [255, 0, 235], [245, 0, 255], [255, 0, 122], [255, 245, 0],
        [10, 190, 212], [214, 255, 0], [0, 204, 255], [20, 0, 255],
        [255, 255, 0], [0, 153, 255], [0, 41, 255], [0, 255, 204],
        [41, 0, 255], [41, 255, 0], [173, 0, 255], [0, 245, 255],
        [71, 0, 255], [122, 0, 255], [0, 255, 184], [0, 92, 255],
        [184, 255, 0], [0, 133, 255], [255, 214, 0], [25, 194, 194],
        [102, 255, 0], [92, 0, 255],
    ], dtype=np.uint8)


def colorize_segmentation(class_map: np.ndarray) -> np.ndarray:
    """(B,H,W) int class ids → (B,H,W,3) uint8 ADE-palette render
    (the conditioning image format the detector emits, __init__.py:20-23)."""
    return ade_palette()[np.asarray(class_map)]


def import_uniformer_backbone(sd: dict, cfg: UniFormerConfig = UniFormerConfig()) -> dict:
    """Backbone slice of an mmseg state dict (numpy values, `backbone.`
    prefixes) → flax params for UniFormerBackbone."""
    conv = lambda w: w.transpose(2, 3, 1, 0)
    lin = lambda w: w.T
    dw = lambda w: w.transpose(2, 3, 1, 0)  # depthwise (C,1,k,k) → (k,k,1,C)

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    bb: dict = {}
    for s in range(1, 5):
        bb[f"patch_embed{s}"] = {"kernel": conv(sd[f"backbone.patch_embed{s}.proj.weight"]),
                                 "bias": sd[f"backbone.patch_embed{s}.proj.bias"]}
        bb[f"patch_norm{s}"] = ln(f"backbone.patch_embed{s}.norm")
        bb[f"norm{s}"] = ln(f"backbone.norm{s}")
        for i in range(cfg.depths[s - 1]):
            t = f"backbone.blocks{s}.{i}"
            blk = {"pos_embed": {"kernel": dw(sd[f"{t}.pos_embed.weight"]),
                                 "bias": sd[f"{t}.pos_embed.bias"]}}
            if s <= 2:
                blk["norm1"] = bn(f"{t}.norm1")
                blk["norm2"] = bn(f"{t}.norm2")
                blk["conv1"] = {"kernel": conv(sd[f"{t}.conv1.weight"]), "bias": sd[f"{t}.conv1.bias"]}
                blk["conv2"] = {"kernel": conv(sd[f"{t}.conv2.weight"]), "bias": sd[f"{t}.conv2.bias"]}
                blk["attn"] = {"kernel": dw(sd[f"{t}.attn.weight"]), "bias": sd[f"{t}.attn.bias"]}
                blk["mlp_fc1"] = {"kernel": conv(sd[f"{t}.mlp.fc1.weight"]), "bias": sd[f"{t}.mlp.fc1.bias"]}
                blk["mlp_fc2"] = {"kernel": conv(sd[f"{t}.mlp.fc2.weight"]), "bias": sd[f"{t}.mlp.fc2.bias"]}
            else:
                blk["norm1"] = ln(f"{t}.norm1")
                blk["norm2"] = ln(f"{t}.norm2")
                blk["qkv"] = {"kernel": lin(sd[f"{t}.attn.qkv.weight"]), "bias": sd[f"{t}.attn.qkv.bias"]}
                blk["proj"] = {"kernel": lin(sd[f"{t}.attn.proj.weight"]), "bias": sd[f"{t}.attn.proj.bias"]}
                blk["mlp_fc1"] = {"kernel": lin(sd[f"{t}.mlp.fc1.weight"]), "bias": sd[f"{t}.mlp.fc1.bias"]}
                blk["mlp_fc2"] = {"kernel": lin(sd[f"{t}.mlp.fc2.weight"]), "bias": sd[f"{t}.mlp.fc2.bias"]}
            bb[f"blocks{s}_{i}"] = blk
    return bb


def import_uniformer_checkpoint(path: str, cfg: UniFormerConfig = UniFormerConfig()) -> dict:
    """upernet_global_small.pth (mmseg format) → flax params."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in raw.get("state_dict", raw).items()}
    conv = lambda w: w.transpose(2, 3, 1, 0)

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}

    bb = import_uniformer_backbone(sd, cfg)

    def convmodule(prefix):
        return {"conv": {"kernel": conv(sd[f"{prefix}.conv.weight"])}, "bn": bn(f"{prefix}.bn")}

    dh: dict = {}
    for si in range(4):
        if si < len(cfg.pool_scales):
            dh[f"psp_{si}"] = convmodule(f"decode_head.psp_modules.{si}.1")
    dh["psp_bottleneck"] = convmodule("decode_head.bottleneck")
    for i in range(3):
        dh[f"lateral_{i}"] = convmodule(f"decode_head.lateral_convs.{i}")
        dh[f"fpn_{i}"] = convmodule(f"decode_head.fpn_convs.{i}")
    dh["fpn_bottleneck"] = convmodule("decode_head.fpn_bottleneck")
    dh["conv_seg"] = {"kernel": conv(sd["decode_head.conv_seg.weight"]),
                      "bias": sd["decode_head.conv_seg.bias"]}
    return {"params": {"backbone": bb, "decode_head": dh}}

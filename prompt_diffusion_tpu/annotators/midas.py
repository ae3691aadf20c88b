"""MiDaS DPT monocular depth + surface normals, as batched Flax modules.

Re-expression of `annotator/midas/` (MidasDetector `__init__.py:9-38`, DPT
`midas/dpt_depth.py`, ViT backbone `midas/vit.py`, fusion blocks
`midas/blocks.py`): a ViT backbone with 4 hook taps → readout-project →
reassemble (per-stage resample to a feature pyramid) → 4 RefineNet-style
fusion blocks → monotone depth head.

Two variants are implemented with the shared DPT decoder:

  * **DPT-Large** (`DPTDepth`): vitl16_384 backbone, hooks [5,11,17,23]
    (`midas/vit.py:183-297`).
  * **DPT-Hybrid** (`DPTHybridDepth`): the reference DEFAULT
    (`annotator/midas/__init__.py:11`, ckpt `dpt_hybrid-midas-501f0c75.pt`
    auto-downloaded `api.py:23,40`) — timm `vit_base_resnet50_384`:
    ResNetV2-50 stem/stages (weight-standardized convs + GroupNorm32,
    stages (3,4,9)), stages 0-1 tapped as pyramid levels 1-2, ViT-B/16
    blocks with hooks [8,11] as levels 3-4 (`midas/vit.py:343-492`).

The detector API matches the reference: relative depth normalized to
[0,1] plus normals from Sobel gradients (`__init__.py:28-36`), but
batched and jittable.

Weight import (`import_dpt_checkpoint`) reads the official dpt_large AND
dpt_hybrid checkpoints (variant sniffed from the key scheme);
`create_dpt(path)` returns the right (model, params) pair.
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


def _vit_dense(pol: DTypePolicy):
    """nn.Dense or its int8 W8A8 drop-in (identical param tree) per the
    policy — the ViT dense stack is ~95% of DPT-Hybrid's FLOPs, the
    high-arithmetic-intensity shape where W8A8 pays (same reasoning as the
    MMDiT blocks, models/mmdit_sd3.py)."""
    if pol.quant == "int8":
        from prompt_diffusion_tpu.ops.quant import QuantDense

        return lambda n, name: QuantDense(n, out_dtype=pol.compute_dtype, name=name)
    return lambda n, name: nn.Dense(n, dtype=pol.compute_dtype,
                                    param_dtype=jnp.float32, name=name)


class ViTBlock(nn.Module):
    cfg: DPTConfig
    policy: DTypePolicy

    @nn.compact
    def __call__(self, x):
        from prompt_diffusion_tpu.models.layers import FusedLayerNorm

        cfg, pol = self.cfg, self.policy
        dense = _vit_dense(pol)
        quant = pol.quant == "int8" and jax.default_backend() != "cpu"
        b, n, _ = x.shape
        # one-pass Pallas LN (fp32 stats); in int8 mode its fused epilogue
        # hands (int8, row scale) straight to QuantDense — the MMDiT pattern
        h = FusedLayerNorm(eps=1e-6, quant_out=quant, name="norm1")(x)
        qkv = dense(3 * cfg.hidden_size, "qkv")(h)
        attn = _vit_attention(qkv, cfg.num_heads, pol)
        x = x + dense(cfg.hidden_size, "proj")(attn.reshape(b, n, -1))
        h = FusedLayerNorm(eps=1e-6, quant_out=quant, name="norm2")(x)
        h = dense(cfg.mlp_ratio * cfg.hidden_size, "fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = dense(cfg.hidden_size, "fc2")(h)
        return x + h


def _vit_attention(qkv: jnp.ndarray, num_heads: int, pol: DTypePolicy) -> jnp.ndarray:
    """Self-attention on a packed (B, N, 3·H·D) qkv projection.

    On TPU with long sequences the packed Pallas kernel consumes the
    projection layout directly — heads are column slices, timm's
    (B, N, 3, H, D) packing — avoiding the four (B,N,H,D)↔(B,H,N,D)
    layout copies per site that the BNHD path pays (~13 ms/trip across the
    12 DPT-Hybrid blocks at batch 16, docs/evidence/q5/trace_ann.log).
    Short sequences and CPU keep the einsum path."""
    b, n, three_hd = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probe
        backend = "cpu"
    if backend in ("tpu", "axon") and n >= 512:
        if pol.quant == "int8":
            from prompt_diffusion_tpu.ops.flash_attention import (
                flash_attention_packed_int8,
            )

            return flash_attention_packed_int8(q, k, v, num_heads)
        from prompt_diffusion_tpu.ops.flash_attention import flash_attention_packed

        return flash_attention_packed(q, k, v, num_heads)
    d = three_hd // 3 // num_heads
    bnhd = lambda t: t.reshape(b, n, num_heads, d)
    out = dot_product_attention(bnhd(q), bnhd(k), bnhd(v),
                                softmax_dtype=pol.softmax_dtype)
    return out.reshape(b, n, num_heads * d)


class _Readout(nn.Module):
    """act_postprocessN.0 readout 'project': cat(tokens, cls) → Linear(2D→D)
    (midas/vit.py ProjectReadout). Restated as sliced matmuls —
    [t, cls]·W = t·W[:D] + cls·W[D:] exactly — so the (B, N, 2D) concat is
    never materialized and the cls half is a rank-1 broadcast instead of a
    full-width matmul. Param layout matches the nn.Dense it replaces."""

    hidden: int
    compute_dtype: object

    @nn.compact
    def __call__(self, tokens, cls_t):
        d = self.hidden
        k = self.param("kernel", nn.initializers.lecun_normal(), (2 * d, d),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        kd = k.astype(self.compute_dtype)
        t = tokens.astype(self.compute_dtype)
        c = cls_t.astype(self.compute_dtype)
        return t @ kd[:d] + (c @ kd[d:] + b.astype(self.compute_dtype))


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
    the DPT decoder) — MXU matmul formulation (ops/resize.py)."""
    from prompt_diffusion_tpu.ops.resize import resize_bilinear

    return resize_bilinear(x, new_h, new_w, align_corners=True)


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
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, cfg.hidden_size), "bilinear",
                                    antialias=False)
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
            t = _Readout(cfg.hidden_size, pol.compute_dtype,
                         name=f"readout_{s}")(tokens, cls_t)
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


# --- DPT-Hybrid (timm vit_base_resnet50_384 backbone) -----------------------


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    hooks: Tuple[int, int] = (8, 11)  # ViT taps (levels 3-4); levels 1-2 are ResNet stages
    resnet_layers: Tuple[int, int, int] = (3, 4, 9)
    reassemble_dims: Tuple[int, ...] = (256, 512, 768, 768)
    features: int = 256
    pos_grid: int = 24  # 384/16 training grid


class StdConv(nn.Module):
    """timm StdConv2dSame: weight-standardized conv (per-out-channel mean/
    biased-var over (kh,kw,cin), eps 1e-6), TF-SAME padding, no bias."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features), jnp.float32)
        m = w.mean(axis=(0, 1, 2), keepdims=True)
        v = w.var(axis=(0, 1, 2), keepdims=True)  # biased, as F.batch_norm
        w = (w - m) * jax.lax.rsqrt(v + self.eps)
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _GNParams(nn.Module):
    """Bare GN affine params under the same scope name ("GroupNorm_0") the
    previous nn.GroupNorm submodule used, so checkpoint import paths are
    unchanged."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GNReLU(nn.Module):
    """timm GroupNormAct(32): GN eps 1e-5 + optional ReLU.

    Routed through the fused Pallas GN(+ReLU) kernel on TPU (fp32 stats,
    one VMEM-resident pass instead of XLA's fp32 convert→reduce→normalize
    chain over the ResNetV2 stage activations); jnp fallback on CPU — the
    same fp32-statistics semantics as torch GroupNorm either way."""

    act: bool = True

    @nn.compact
    def __call__(self, x):
        from prompt_diffusion_tpu.ops.fused_group_norm import group_norm_auto

        scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
        return group_norm_auto(x, 32, scale, bias, eps=1e-5,
                               apply_relu=self.act)


class Bottleneck(nn.Module):
    """timm resnetv2.Bottleneck (preact=False): conv→GN+ReLU ×2,
    conv→GN, add shortcut, ReLU. Downsample = 1×1 conv→GN on the first
    block of a stage."""

    out_ch: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        if self.has_downsample:
            sc = StdConv(self.out_ch, (1, 1), (self.stride, self.stride),
                         name="downsample_conv")(x)
            sc = GNReLU(act=False, name="downsample_norm")(sc).astype(x.dtype)
        else:
            sc = x
        h = StdConv(mid, (1, 1), name="conv1")(x)
        h = GNReLU(name="norm1")(h).astype(x.dtype)
        h = StdConv(mid, (3, 3), (self.stride, self.stride), name="conv2")(h)
        h = GNReLU(name="norm2")(h).astype(x.dtype)
        h = StdConv(self.out_ch, (1, 1), name="conv3")(h)
        h = GNReLU(act=False, name="norm3")(h).astype(x.dtype)
        return jax.nn.relu(h + sc)


class DPTHybridDepth(nn.Module):
    """(B,H,W,3) in [-1,1] → (B,H,W) relative inverse depth (≥0).

    ResNetV2 stem (7×7/2 StdConv + GN + 3×3/2 SAME maxpool) → stages
    (3,4,9) at strides (1,2,2) — stage outputs 256/512ch become pyramid
    levels 1-2 (act_postprocess1/2 are Identity in the reference,
    vit.py:423-428) — final 1024ch map → 1×1 proj to 768 tokens → ViT-B
    blocks; hooks (8,11) readout-projected to levels 3-4
    (act_postprocess3/4, vit.py:430-460)."""

    config: DPTHybridConfig = DPTHybridConfig()
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        cfg, pol = self.config, self.policy
        b, H, W, _ = img.shape
        gh, gw = H // cfg.patch_size, W // cfg.patch_size

        x = img.astype(pol.compute_dtype)
        x = StdConv(64, (7, 7), (2, 2), name="stem_conv")(x)
        x = GNReLU(name="stem_norm")(x).astype(pol.compute_dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps_rn = []
        widths = (256, 512, 1024)
        for s, depth in enumerate(cfg.resnet_layers):
            stride = 1 if s == 0 else 2
            for bi in range(depth):
                x = Bottleneck(widths[s], stride=stride if bi == 0 else 1,
                               has_downsample=(bi == 0),
                               name=f"stage{s}_block{bi}")(x)
            if s < 2:
                taps_rn.append(x)

        # HybridEmbed: 1×1 proj of the stride-16 map to ViT width
        t = nn.Conv(cfg.hidden_size, (1, 1), dtype=pol.compute_dtype,
                    param_dtype=jnp.float32, name="embed_proj")(x)
        t = t.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.pos_grid * cfg.pos_grid + 1, cfg.hidden_size), jnp.float32)
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(1, cfg.pos_grid, cfg.pos_grid, cfg.hidden_size)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, cfg.hidden_size), "bilinear",
                                    antialias=False)
        pos_grid = pos_grid.reshape(1, gh * gw, cfg.hidden_size)
        t = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(t.dtype), t], axis=1)
        t = t + jnp.concatenate([pos_cls, pos_grid], axis=1).astype(t.dtype)

        vcfg = DPTConfig(hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
                         num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio)
        taps_vit = []
        for i in range(cfg.num_layers):
            t = ViTBlock(vcfg, pol, name=f"blocks_{i}")(t)
            if i in cfg.hooks:
                taps_vit.append(t)

        pyramid = list(taps_rn)  # levels 1-2: raw ResNet features
        for s, tap in enumerate(taps_vit):
            tokens, cls_t = tap[:, 1:], tap[:, :1]
            r = _Readout(cfg.hidden_size, pol.compute_dtype,
                         name=f"readout_{s + 2}")(tokens, cls_t)
            r = jax.nn.gelu(r, approximate=False)
            r = r.reshape(b, gh, gw, cfg.hidden_size)
            r = nn.Conv(cfg.reassemble_dims[s + 2], (1, 1), dtype=pol.compute_dtype,
                        param_dtype=jnp.float32, name=f"reassemble_proj_{s + 2}")(r)
            if s == 1:  # level 4: extra 3×3 stride-2 conv (act_postprocess4.4)
                r = nn.Conv(cfg.reassemble_dims[3], (3, 3), strides=(2, 2), padding=1,
                            dtype=pol.compute_dtype, param_dtype=jnp.float32,
                            name="resample_3")(r)
            pyramid.append(r)

        pyramid = [
            nn.Conv(cfg.features, (3, 3), padding=1, use_bias=False,
                    dtype=pol.compute_dtype, param_dtype=jnp.float32,
                    name=f"scratch_rn_{s}")(p)
            for s, p in enumerate(pyramid)
        ]
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


def convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) → flax ConvTranspose
    kernel (kh, kw, in, out) WITH a spatial flip: flax/lax conv_transpose
    (transpose_kernel=False) does NOT reverse the spatial axes, while
    torch's gradient-derived ConvTranspose2d does — an unflipped import
    mirrors every stride-sized upsample block (verified empirically:
    flipped import is bit-exact vs torch, unflipped is not —
    tests/test_midas.py::test_convtranspose_import_matches_torch)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1])


def import_dpt_checkpoint(path: str, cfg: DPTConfig = DPTConfig()) -> dict:
    """Official dpt_large-midas OR dpt_hybrid-midas checkpoint → flax
    params (variant sniffed from the backbone key scheme)."""
    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    if "pretrained.model.patch_embed.backbone.stem.conv.weight" in sd:
        return _import_dpt_hybrid(sd)
    conv = lambda w: w.transpose(2, 3, 1, 0)
    lin = lambda w: w.T
    convt = convt_kernel  # ConvTranspose needs the spatial flip, see its doc
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
            # resample 0/1 are ConvTranspose (stage 3 is a plain conv)
            kern = convt(w) if s in (0, 1) else conv(w)
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


def _import_dpt_hybrid(sd: dict, cfg: DPTHybridConfig = DPTHybridConfig()) -> dict:
    """dpt_hybrid-midas-501f0c75.pt key scheme → DPTHybridDepth params.

    Backbone keys are the timm vit_base_resnet50_384 layout:
    `pretrained.model.patch_embed.backbone.{stem,stages.S.blocks.B}.*`
    (StdConv weights, GroupNorm affine), `pretrained.model.blocks.I.*`
    (ViT-B), decoder `pretrained.act_postprocess{3,4}.*` + `scratch.*`
    (act_postprocess1/2 are Identity, vit.py:423-428)."""
    conv = lambda w: w.transpose(2, 3, 1, 0)
    lin = lambda w: w.T
    bb = "pretrained.model.patch_embed.backbone"
    p: dict = {
        "stem_conv": {"kernel": conv(sd[f"{bb}.stem.conv.weight"])},
        "stem_norm": {"GroupNorm_0": {"scale": sd[f"{bb}.stem.norm.weight"],
                                      "bias": sd[f"{bb}.stem.norm.bias"]}},
        "embed_proj": {"kernel": conv(sd["pretrained.model.patch_embed.proj.weight"]),
                       "bias": sd["pretrained.model.patch_embed.proj.bias"]},
        "cls_token": sd["pretrained.model.cls_token"],
        "pos_embed": sd["pretrained.model.pos_embed"],
    }

    def gn(prefix):
        return {"GroupNorm_0": {"scale": sd[f"{prefix}.weight"],
                                "bias": sd[f"{prefix}.bias"]}}

    for s, depth in enumerate(cfg.resnet_layers):
        for bi in range(depth):
            t = f"{bb}.stages.{s}.blocks.{bi}"
            blk = {
                "conv1": {"kernel": conv(sd[f"{t}.conv1.weight"])},
                "norm1": gn(f"{t}.norm1"),
                "conv2": {"kernel": conv(sd[f"{t}.conv2.weight"])},
                "norm2": gn(f"{t}.norm2"),
                "conv3": {"kernel": conv(sd[f"{t}.conv3.weight"])},
                "norm3": gn(f"{t}.norm3"),
            }
            if bi == 0:
                blk["downsample_conv"] = {"kernel": conv(sd[f"{t}.downsample.conv.weight"])}
                blk["downsample_norm"] = gn(f"{t}.downsample.norm")
            p[f"stage{s}_block{bi}"] = blk
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
    for s, act in ((2, "pretrained.act_postprocess3"), (3, "pretrained.act_postprocess4")):
        p[f"readout_{s}"] = {"kernel": lin(sd[f"{act}.0.project.0.weight"]),
                             "bias": sd[f"{act}.0.project.0.bias"]}
        p[f"reassemble_proj_{s}"] = {"kernel": conv(sd[f"{act}.3.weight"]),
                                     "bias": sd[f"{act}.3.bias"]}
    p["resample_3"] = {"kernel": conv(sd["pretrained.act_postprocess4.4.weight"]),
                       "bias": sd["pretrained.act_postprocess4.4.bias"]}
    for s in range(4):
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


def create_dpt(path: str):
    """(model, params) for a MiDaS checkpoint — DPTHybridDepth for the
    ecosystem-default dpt_hybrid file, DPTDepth for dpt_large
    (api.py:30-46 dispatch)."""
    params = import_dpt_checkpoint(path)
    model = (DPTHybridDepth() if "stem_conv" in params["params"] else DPTDepth())
    return model, params

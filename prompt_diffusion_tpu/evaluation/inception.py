"""InceptionV3 feature extractor for FID (Flax, NHWC).

The FID-standard "pt_inception" network (TF-Slim InceptionV3 as shipped by
pytorch-fid / used via NVIDIA's pickle in eval/fid.py:34): stem → 3×A →
B → 4×C(7×7 widths 128/160/160/192) → D → 2×E → global-avg-pool → 2048-d
features. BatchNorm runs in inference mode from imported running stats
(eps 1e-3). The FID variant's pooling quirks (avg-pool with
count_include_pad=False in A/C/E-pool branches) are reproduced.

`load_inception_params(path)` imports the pytorch-fid checkpoint
(`pt_inception-2015-12-05-6726825d.pth`) when the user supplies it; with
no weights available (zero-egress environments) FID can still rank runs
using any jittable embedder via evaluation.fid's pluggable feature_fn.

Input: (B, H, W, 3) in [0, 1]; resized to 299² and scaled to [-1, 1]
inside, matching the reference detector preprocessing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = "VALID"

    @nn.compact
    def __call__(self, x):
        # he_normal: with the random-weight fallback (no pt_inception file)
        # lecun init shrinks activations ~0.8× per ReLU layer → features
        # collapse to ~1e-4 after 90 layers and rank-only FID comparisons
        # read 0.00; variance-preserving init keeps random features O(1).
        # Irrelevant when real weights are imported (params overwritten).
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=jnp.float32, name="conv")(x)
        # inference-mode BN from imported running stats
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _avg_pool_nocountpad(x, window=3):
    """3×3 stride-1 avg pool, count_include_pad=False (FID variant)."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME")
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME")
    return sums / counts


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=[(2, 2), (2, 2)], name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocountpad(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocountpad(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """last_pool: 'avg' (FID E1, count_include_pad=False) or 'max' (E2)."""

    last_pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.last_pool == "avg":
            bp = _avg_pool_nocountpad(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Images (B,H,W,3) in [0,1] → pool3 features (B, 2048)."""

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        if x.shape[1] != 299 or x.shape[2] != 299:
            # antialias=False: pytorch-fid resizes with plain
            # F.interpolate(mode='bilinear', align_corners=False) — FID is
            # sensitive to the resize kernel, and jax's default antialias
            # would put our numbers on a different scale than
            # reference-computed ones
            x = jax.image.resize(x, (b, 299, 299, 3), method="bilinear",
                                 antialias=False)
        x = x * 2.0 - 1.0
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=[(1, 1), (1, 1)], name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def load_inception_params(path: Optional[str] = None):
    """Import pt_inception-2015-12-05 torch weights when available; else
    deterministic random params (rank-only FID comparisons)."""
    model = InceptionV3()
    if path is None:
        return jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    params: dict = {}

    def put(flax_path, torch_prefix):
        node = params
        for part in flax_path.split("/"):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": sd[f"{torch_prefix}.conv.weight"].transpose(2, 3, 1, 0)}
        node["bn_scale"] = sd[f"{torch_prefix}.bn.weight"]
        node["bn_bias"] = sd[f"{torch_prefix}.bn.bias"]
        node["bn_mean"] = sd[f"{torch_prefix}.bn.running_mean"]
        node["bn_var"] = sd[f"{torch_prefix}.bn.running_var"]

    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        put(name, name)
    blocks = {
        "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                     "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
        "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
        "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
        "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                     "branch7x7x3_3", "branch7x7x3_4"],
        "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                     "branch3x3dbl_3b", "branch_pool"],
    }
    blocks["Mixed_5c"] = blocks["Mixed_5d"] = blocks["Mixed_5b"]
    blocks["Mixed_6c"] = blocks["Mixed_6d"] = blocks["Mixed_6e"] = blocks["Mixed_6b"]
    blocks["Mixed_7c"] = blocks["Mixed_7b"]
    for mixed, branches in blocks.items():
        for br in branches:
            put(f"{mixed}/{br}", f"{mixed}.{br}")
    return {"params": params}

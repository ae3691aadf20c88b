"""HED (holistically-nested edge detection) as a batched Flax module.

Re-expression of `annotator/hed/__init__.py:9-114`: VGG16 trunk with 5
per-scale 1×1 score heads, bilinear-upsampled and fused by a 1×1 conv +
sigmoid. The torch detector is single-image CUDA; this one is batched NHWC
and jittable.

Input: RGB float [0,255], shape (B,H,W,3). The caffe-style preprocessing
(BGR flip + mean subtraction, reference forward :74-76) happens inside.
Output: (B,H,W) edge probability in [0,1] (scale by 255 for the uint8 map).

Weight import: `import_hed_checkpoint` maps the reference's
network-bsds500.pth (netVgg*/netScore*/netCombine keys).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.ops.resize import resize_bilinear
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy

_BGR_MEAN = (104.00698793, 116.66876762, 122.67891434)
# conv counts per VGG stage: (2, 2, 3, 3, 3); widths (64, 128, 256, 512, 512)
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class _Combine(nn.Module):
    """The reference's netCombine 1×1 conv over the 5 concatenated score
    maps, restated as a weighted sum of the (B, H, W, 1) scores: a 5-channel
    concat at full resolution is a layout-pathological op on TPU (lane dim
    padded 5 → 128; 3 ms/trip in the q5 trace) while the equivalent FMA
    chain fuses into the score upsamples. Param layout (kernel (1,1,5,1) +
    bias) is unchanged, so checkpoint import is untouched."""

    @nn.compact
    def __call__(self, scores):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, len(scores), 1), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        out = b[0]
        for s, sc in enumerate(scores):
            out = out + sc[..., 0].astype(jnp.float32) * k[0, 0, s, 0]
        return out  # (B, H, W) fp32


class HEDNetwork(nn.Module):
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        pol = self.policy
        # The reference flips RGB→BGR then subtracts the caffe BGR mean
        # (forward :74-76). A channel reverse of the full activation is a
        # lane-dim shuffle on TPU (2 ms/trip, q5 trace), so the flip is
        # folded into the first conv's input channels at import time
        # (import_hed_checkpoint) and the mean is subtracted in RGB order —
        # mathematically identical.
        x = rgb.astype(jnp.float32) - jnp.asarray(_BGR_MEAN[::-1], jnp.float32)
        x = x.astype(pol.compute_dtype)
        b, h, w, _ = x.shape

        scores = []
        for s, (width, n_convs) in enumerate(_STAGES):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c in range(n_convs):
                x = nn.Conv(width, (3, 3), padding=1, dtype=pol.compute_dtype,
                            param_dtype=jnp.float32, name=f"vgg_{s}_conv_{c}")(x)
                x = jax.nn.relu(x)
            score = nn.Conv(1, (1, 1), dtype=pol.compute_dtype, param_dtype=jnp.float32,
                            name=f"score_{s}")(x)
            scores.append(resize_bilinear(score.astype(jnp.float32), h, w))

        fused = _Combine(name="combine")(scores)
        return jax.nn.sigmoid(fused)


_TORCH_STAGE_NAMES = ("netVggOne", "netVggTwo", "netVggThr", "netVggFou", "netVggFiv")
_TORCH_SCORE_NAMES = ("netScoreOne", "netScoreTwo", "netScoreThr", "netScoreFou", "netScoreFiv")


def import_hed_checkpoint(path: str) -> dict:
    """network-bsds500.pth → flax params for HEDNetwork."""
    import torch

    sd = {k.replace("module", "net"): v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    p = {}
    for s, (width, n_convs) in enumerate(_STAGES):
        # torch Sequential indices: stage>0 starts with MaxPool at 0, convs
        # at (1,3,5,...); stage 0 has convs at (0,2,...)
        base = 1 if s > 0 else 0
        for c in range(n_convs):
            idx = base + 2 * c
            key = f"{_TORCH_STAGE_NAMES[s]}.{idx}"
            kern = sd[f"{key}.weight"].transpose(2, 3, 1, 0)
            if s == 0 and c == 0:
                # the module consumes RGB directly; the reference's first
                # conv expects BGR — reverse its input channels (exact)
                kern = kern[:, :, ::-1, :].copy()
            p[f"vgg_{s}_conv_{c}"] = {
                "kernel": kern,
                "bias": sd[f"{key}.bias"],
            }
        p[f"score_{s}"] = {
            "kernel": sd[f"{_TORCH_SCORE_NAMES[s]}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{_TORCH_SCORE_NAMES[s]}.bias"],
        }
    p["combine"] = {
        "kernel": sd["netCombine.0.weight"].transpose(2, 3, 1, 0),
        "bias": sd["netCombine.0.bias"],
    }
    return {"params": p}


def nms_edges(x: jnp.ndarray, threshold: float, sigma: float) -> jnp.ndarray:
    """Jittable port of the reference's `nms` util (:117-132): Gaussian blur,
    keep pixels that are maxima along any of 4 line structuring elements,
    binarize. x: (B,H,W) float [0,255]."""
    radius = max(1, int(3 * sigma))
    size = 2 * radius + 1
    g = np.exp(-0.5 * ((np.arange(size) - radius) / sigma) ** 2)
    k2 = np.outer(g, g).astype(np.float32)
    k2 /= k2.sum()

    def conv(img, kernel):
        k = jnp.asarray(kernel)[:, :, None, None]
        return jax.lax.conv_general_dilated(
            img[..., None], k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[..., 0]

    xb = conv(x.astype(jnp.float32), k2)
    neg = -1e9
    f1 = np.asarray([[neg, neg, neg], [0, 0, 0], [neg, neg, neg]], np.float32)
    f2 = f1.T
    f3 = np.asarray([[0, neg, neg], [neg, 0, neg], [neg, neg, 0]], np.float32)
    f4 = f3[:, ::-1]
    y = jnp.zeros_like(xb)
    for f in (f1, f2, f3, f4):
        # dilation with flat line SE == max-pool along the line
        dil = _max_filter(xb, f)
        y = jnp.where(dil == xb, xb, y)
    return (y > threshold).astype(jnp.float32) * 255.0


def _max_filter(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """Grayscale dilation with a 3×3 flat structuring element, via shifts."""
    best = jnp.full_like(img, -jnp.inf)
    for dy in range(3):
        for dx in range(3):
            if se[dy, dx] < -1:  # masked-out position
                continue
            shifted = jnp.roll(img, (1 - dy, 1 - dx), axis=(1, 2))
            best = jnp.maximum(best, shifted)
    return best

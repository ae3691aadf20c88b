"""M-LSD line segment detection (MobileV2_MLSD_Large) as Flax modules.

Re-expression of `annotator/mlsd/` (MLSDdetector `__init__.py:17-39`,
MobileV2_MLSD_Large `models/mbv2_mlsd_large.py`, decode `utils.py:19-86`):
a truncated MobileNetV2 (4-channel input — RGB + ones plane) with FPN taps
at feature indices (1,3,6,10,13), TypeA/B/C fusion decoder emitting 16
maps of which channels 7: are kept (1 center + 4 displacement + 4 aux);
line decode = sigmoid-center NMS (5×5), top-K centers, displacement
endpoints, score/length thresholds, cv2 line render.

BatchNorms run in inference mode from imported stats; activations ReLU6
(MobileNetV2) / ReLU (decoder blocks), matching torch.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.annotators.uniformer import InferenceBN
from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy

# (expand t, out c, repeats n, stride s) — truncated MobileNetV2 table
_IR_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2), (6, 96, 3, 1)]
_FPN_SELECTED = (1, 3, 6, 10, 13)


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    padding=pad, feature_group_count=self.groups, use_bias=False,
                    dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name="conv")(x)
        x = InferenceBN(name="bn")(x)
        return jnp.minimum(jax.nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand: int
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        idx = 0
        if self.expand != 1:
            h = ConvBNReLU6(hidden, 1, policy=self.policy, name=f"layer_{idx}")(h)
            idx += 1
        h = ConvBNReLU6(hidden, 3, self.stride, groups=hidden, policy=self.policy,
                        name=f"layer_{idx}")(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.policy.compute_dtype, param_dtype=jnp.float32,
                    name="project")(h)
        h = InferenceBN(name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_channels:
            return x + h
        return h


class BlockA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool = True
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, a, b):
        b = nn.Conv(self.out_c2, (1, 1), use_bias=True, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv1")(b)
        b = InferenceBN(name="bn1")(b)
        b = jax.nn.relu(b)
        a = nn.Conv(self.out_c1, (1, 1), use_bias=True, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv2")(a)
        a = InferenceBN(name="bn2")(a)
        a = jax.nn.relu(a)
        if self.upscale:
            from prompt_diffusion_tpu.annotators.midas import _resize_align_corners

            bb, hh, ww, cc = b.shape
            b = _resize_align_corners(b, hh * 2, ww * 2)
        return jnp.concatenate([a, b], axis=-1)


class BlockB(nn.Module):
    out_c: int
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = nn.Conv(in_c, (3, 3), padding=1, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = InferenceBN(name="bn1")(h)
        x = jax.nn.relu(h) + x
        h = nn.Conv(self.out_c, (3, 3), padding=1, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        h = InferenceBN(name="bn2")(h)
        return jax.nn.relu(h)


class BlockC(nn.Module):
    out_c: int
    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = nn.Conv(in_c, (3, 3), padding=5, kernel_dilation=(5, 5),
                    dtype=self.policy.compute_dtype, param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(InferenceBN(name="bn1")(h))
        h = nn.Conv(in_c, (3, 3), padding=1, dtype=self.policy.compute_dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = jax.nn.relu(InferenceBN(name="bn2")(h))
        return nn.Conv(self.out_c, (1, 1), dtype=self.policy.compute_dtype,
                       param_dtype=jnp.float32, name="conv3")(h)


class MLSDNet(nn.Module):
    """(B,H,W,4) [-1,1] (RGB + ones) → (B,H/2,W/2,9): sigmoid-able center
    logit [0] + displacement [1:5] + aux [5:9] (the torch `x[:,7:]` slice)."""

    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        pol = self.policy
        x = x.astype(pol.compute_dtype)
        feats = []
        h = ConvBNReLU6(32, 3, 2, policy=pol, name="features_0")(x)
        fi = 1
        for t, c, n, s in _IR_SETTING:
            for i in range(n):
                h = InvertedResidual(c, s if i == 0 else 1, t, policy=pol,
                                     name=f"features_{fi}")(h)
                if fi in _FPN_SELECTED:
                    feats.append(h)
                fi += 1
        c1, c2, c3, c4, c5 = feats
        h = BlockA(64, 64, upscale=False, policy=pol, name="block15")(c4, c5)
        h = BlockB(64, policy=pol, name="block16")(h)
        h = BlockA(64, 64, policy=pol, name="block17")(c3, h)
        h = BlockB(64, policy=pol, name="block18")(h)
        h = BlockA(64, 64, policy=pol, name="block19")(c2, h)
        h = BlockB(64, policy=pol, name="block20")(h)
        h = BlockA(64, 64, policy=pol, name="block21")(c1, h)
        h = BlockB(64, policy=pol, name="block22")(h)
        h = BlockC(16, policy=pol, name="block23")(h)
        return h[..., 7:].astype(jnp.float32)


def decode_lines(out: np.ndarray, score_thr: float = 0.10, dist_thr: float = 20.0,
                 topk: int = 200, ksize: int = 3) -> np.ndarray:
    """utils.py pred_lines decode on one (H,W,9) output → (N,4) segments in
    the output-map coordinate frame ×2 (the model halves resolution).
    ksize=3: pred_lines calls deccode_output_score_and_ptss(outputs, 200, 3)
    (utils.py:63), not the deccode function's own default of 5."""
    center = out[..., 0]
    disp = out[..., 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    # ksize NMS (3 — see docstring)
    from scipy.ndimage import maximum_filter

    keep = maximum_filter(heat, size=ksize, mode="constant") == heat
    heat = heat * keep
    flat = heat.ravel()
    idx = np.argpartition(flat, -topk)[-topk:]
    idx = idx[np.argsort(-flat[idx])]
    ys, xs = np.unravel_index(idx, heat.shape)
    segments = []
    for y, x in zip(ys, xs):
        score = heat[y, x]
        dx0, dy0, dx1, dy1 = disp[y, x]
        dist = np.hypot((dx0 - dx1), (dy0 - dy1))
        if score > score_thr and dist > dist_thr:
            segments.append([x + dx0, y + dy0, x + dx1, y + dy1])
    return 2 * np.asarray(segments) if segments else np.zeros((0, 4))


@dataclasses.dataclass
class MLSDdetector:
    params: dict

    def __post_init__(self):
        self._net = MLSDNet()
        self._fwd = jax.jit(lambda p, x: self._net.apply(p, x))

    def __call__(self, image_u8: np.ndarray, thr_v: float = 0.1, thr_d: float = 0.1):
        import cv2

        h, w = image_u8.shape[:2]
        resized = cv2.resize(image_u8, (512, 512), interpolation=cv2.INTER_AREA)
        inp = np.concatenate([resized, np.ones((512, 512, 1))], axis=-1)
        inp = inp.astype(np.float32) / 127.5 - 1.0
        out = np.asarray(self._fwd(self.params, jnp.asarray(inp[None])))[0]
        # thr_d passes through UNCHANGED (reference __init__.py:33 →
        # pred_lines(..., thr_v, thr_d) → `distance > dist_thr` in output
        # px, utils.py:72 — the gradio default 0.1 keeps nearly all
        # candidates, it is NOT a [0,1] fraction to rescale)
        lines = decode_lines(out, thr_v, thr_d)
        canvas = np.zeros((h, w, 3), np.uint8)
        for x0, y0, x1, y1 in lines:
            cv2.line(canvas,
                     (int(x0 * w / 512), int(y0 * h / 512)),
                     (int(x1 * w / 512), int(y1 * h / 512)),
                     (255, 255, 255), 1)
        return canvas[:, :, 0]


def import_mlsd_checkpoint(path: str) -> dict:
    """mlsd_large_512_fp32.pth → flax params."""
    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    conv = lambda w: w.transpose(2, 3, 1, 0)
    dw = lambda w: w.transpose(2, 3, 1, 0)  # depthwise (C,1,k,k) → (k,k,1,C)

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}

    p: dict = {}
    # features.0 = ConvBNReLU (conv at .0, bn at .1)
    p["features_0"] = {"conv": {"kernel": conv(sd["backbone.features.0.0.weight"])},
                       "bn": bn("backbone.features.0.1")}
    fi = 1
    for t, c, n, s in _IR_SETTING:
        for i in range(n):
            tp = f"backbone.features.{fi}.conv"
            blk: dict = {}
            li = 0
            off = 0
            if t != 1:
                blk[f"layer_{li}"] = {
                    "conv": {"kernel": conv(sd[f"{tp}.0.0.weight"])}, "bn": bn(f"{tp}.0.1")}
                li += 1
                off = 1
            w_dw = sd[f"{tp}.{off}.0.weight"]
            blk[f"layer_{li}"] = {"conv": {"kernel": dw(w_dw)}, "bn": bn(f"{tp}.{off}.1")}
            blk["project"] = {"kernel": conv(sd[f"{tp}.{off + 1}.weight"])}
            blk["project_bn"] = bn(f"{tp}.{off + 2}")
            p[f"features_{fi}"] = blk
            fi += 1

    def seq_block(tname, fname, convs):
        node = {}
        for (ti, fi_name) in convs:
            node[f"conv{fi_name}"] = {"kernel": conv(sd[f"{tname}.conv{ti}.0.weight"]),
                                      "bias": sd[f"{tname}.conv{ti}.0.bias"]}
            node[f"bn{fi_name}"] = bn(f"{tname}.conv{ti}.1")
        p[fname] = node

    for blk in (15, 17, 19, 21):  # BlockTypeA
        seq_block(f"block{blk}", f"block{blk}", [(1, 1), (2, 2)])
    for blk in (16, 18, 20, 22):  # BlockTypeB
        seq_block(f"block{blk}", f"block{blk}", [(1, 1), (2, 2)])
    # BlockTypeC: conv1/conv2 sequential + bare conv3
    seq_block("block23", "block23", [(1, 1), (2, 2)])
    p["block23"]["conv3"] = {"kernel": conv(sd["block23.conv3.weight"]),
                             "bias": sd["block23.conv3.bias"]}
    return {"params": p}

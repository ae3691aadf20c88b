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


@pytest.mark.parametrize("n,heads,d", [(1025, 12, 64), (1024, 5, 64)])
def test_packed_kernel_annotator_vit_shapes(n, heads, d):
    """The DPT-Hybrid (N=1025 = 32² tokens + cls, H·D=768) and UniFormer
    stage-3 (N=1024, H·D=320 — lane dim NOT a 128 multiple) self-attention
    shapes routed through the packed kernel by `_vit_attention`
    (annotators/midas.py)."""
    rng = np.random.default_rng(2)
    hd = heads * d
    mk = lambda: jnp.asarray(rng.normal(size=(1, n, hd)) * 0.3, jnp.float32)
    q, k, v = mk(), mk(), mk()
    scale = d ** -0.5
    ref = _xla_attention(
        q.reshape(1, n, heads, d), k.reshape(1, n, heads, d),
        v.reshape(1, n, heads, d), scale).reshape(1, n, hd)
    out = flash_attention_packed(q, k, v, heads, scale)
    assert out.shape == ref.shape
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
    """Model the SHIPPED v3 kernel's math in plain numpy/jnp — per-HEAD
    scalar K scale folded into the softmax multiplier, per-ROW Q quant
    inside the kernel, fp32 softmax, **bf16 P·V** (no P/V quantization) —
    exactly `_fa_packed_fullk_int8_kernel` + the host-side K quant in
    `flash_attention_packed_int8`. Bounds the scheme's error vs exact
    attention, including a K outlier row that inflates the per-head
    scalar scale (the scheme's worst case). Device numerics are asserted
    by tools/attn_sd3_probe.py (kernel falls back to bf16 on CPU)."""
    rng = np.random.default_rng(2)
    n, d = 96, 32
    q = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    k = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    k[7] *= 4.0  # outlier row: blows up the per-head scalar scale
    v = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    scale = d ** -0.5

    # host side: per-HEAD scalar K scale (one head here)
    sk = max(np.abs(k).max() / 127.0, 1e-8)
    ki = np.clip(np.round(k / sk), -127, 127).astype(np.int32)
    # kernel: per-row Q quant
    sq = np.maximum(np.abs(q).max(-1, keepdims=True) / 127.0, 1e-8)
    qi = np.clip(np.round(q / sq), -127, 127).astype(np.int32)
    s = (qi @ ki.T).astype(np.float32) * (sq * (sk * scale))
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    # P·V in bf16 (kernel casts p to v's storage dtype)
    pv = jnp.dot(jnp.asarray(p, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    o = np.asarray(pv, np.float64) / l

    s_ref = (q @ k.T) * scale
    p_ref = np.exp(s_ref - s_ref.max(-1, keepdims=True))
    o_ref = (p_ref / p_ref.sum(-1, keepdims=True)) @ v

    rel = np.linalg.norm(o - o_ref) / np.linalg.norm(o_ref)
    assert rel < 0.02, rel  # lab: 0.51% at the SD3 joint shape

"""fused activation→int8 op tests (ops/fused_act.py).

CPU uses the jnp fallback; the Pallas kernels additionally run in
interpret mode (row padding + grid indexing) without a TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import prompt_diffusion_tpu.ops.fused_act as fa
from prompt_diffusion_tpu.ops.fused_act import fused_gelu_quant, fused_quant_rows


def _ref_pair(x, gelu):
    h = np.asarray(x, np.float32)
    if gelu:
        t = jnp.asarray(h)
        h = np.asarray(jax.nn.gelu(t, approximate=True), np.float32)
    s = np.maximum(np.abs(h).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    q = np.clip(np.round(h / s), -127, 127).astype(np.int8)
    return q, s


@pytest.mark.parametrize("gelu", [True, False])
def test_jnp_path_matches_reference(gelu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 128)) * 2.0, jnp.float32)
    fn = fused_gelu_quant if gelu else fused_quant_rows
    oq, sa = fn(x)
    ref_q, ref_s = _ref_pair(x, gelu)
    assert oq.dtype == jnp.int8 and sa.shape == (2, 24, 1)
    np.testing.assert_array_equal(np.asarray(oq), ref_q)
    np.testing.assert_allclose(np.asarray(sa), ref_s, rtol=1e-6)


@pytest.mark.parametrize("n", [154, 333])  # SD3 context lengths (row-pad path)
@pytest.mark.parametrize("gelu", [True, False])
def test_pallas_interpret_matches_jnp(n, gelu, monkeypatch):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, n, 128)) * 2.0, jnp.float32)
    fn = fused_gelu_quant if gelu else fused_quant_rows
    ref_q, ref_s = fn(x)  # cpu jnp path
    monkeypatch.setattr(fa, "_FORCE_INTERPRET", True)
    oq, sa = fn(x)
    assert oq.shape == (2, n, 128) and sa.shape == (2, n, 1)
    np.testing.assert_array_equal(np.asarray(oq), np.asarray(ref_q))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(ref_s), rtol=1e-6)


def test_quantdense_consumes_fused_pair():
    """The (int8, row-scale) pair must drop into tuple-aware QuantDense and
    dequantize to ≈ the float matmul (per-row quant error bound)."""
    from prompt_diffusion_tpu.ops.quant import QuantDense

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    layer = QuantDense(32, out_dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    h = jax.nn.gelu(x, approximate=True)
    out_pair = layer.apply(params, fused_gelu_quant(x))
    out_f32 = h.astype(jnp.float32) @ np.asarray(
        params["params"]["kernel"], np.float32)
    rel = np.linalg.norm(np.asarray(out_pair) - np.asarray(out_f32)) / (
        np.linalg.norm(np.asarray(out_f32)) + 1e-9)
    assert rel < 0.03, rel


@pytest.mark.parametrize("n", [24, 154])
def test_fused_geglu_quant_matches_reference(n, monkeypatch):
    """GEGLU (h·gelu_erf(gate)) + per-row quant, jnp and interpret paths."""
    rng = np.random.default_rng(3)
    proj = jnp.asarray(rng.normal(size=(2, n, 2 * 64)), jnp.float32)
    h, gate = np.split(np.asarray(proj, np.float32), 2, axis=-1)
    ref = h * np.asarray(jax.nn.gelu(jnp.asarray(gate), approximate=False),
                         np.float32)
    s = np.maximum(np.abs(ref).max(axis=-1, keepdims=True) / 127.0, 1e-8)
    ref_q = np.clip(np.round(ref / s), -127, 127).astype(np.int8)

    from prompt_diffusion_tpu.ops.fused_act import fused_geglu_quant

    oq, sa = fused_geglu_quant(proj)  # cpu jnp path
    assert oq.shape == (2, n, 64) and sa.shape == (2, n, 1)
    np.testing.assert_array_equal(np.asarray(oq), ref_q)
    np.testing.assert_allclose(np.asarray(sa), s, rtol=1e-6)

    # the kernel computes erf via the in-kernel A&S approximation (Mosaic
    # has no erf lowering); its ~1e-7 error can flip an int8 rounding only
    # when a value sits exactly on a .5 boundary — allow that, nothing more
    monkeypatch.setattr(fa, "_FORCE_INTERPRET", True)
    oq2, sa2 = fused_geglu_quant(proj)
    diff = np.abs(np.asarray(oq2, np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-3, (
        diff.max(), (diff != 0).mean())
    np.testing.assert_allclose(np.asarray(sa2), s, rtol=1e-5)


def test_erf_approximation_accuracy():
    """The in-kernel erf (A&S 7.1.26) vs lax.erf over a wide input range:
    ≤1e-6 on erf and on the resulting exact-erf GELU (theory 1.5e-7 +
    fp32 rounding; measured 4.7e-7 / 4.2e-7)."""
    from prompt_diffusion_tpu.ops.fused_act import _erf_as

    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    approx = np.asarray(_erf_as(x), np.float64)
    exact = np.asarray(jax.lax.erf(x), np.float64)
    assert np.abs(approx - exact).max() < 1e-6

    xg = np.asarray(x, np.float64)
    gelu_a = 0.5 * xg * (1.0 + np.asarray(_erf_as(x * (2.0 ** -0.5)), np.float64))
    gelu_e = np.asarray(jax.nn.gelu(x, approximate=False), np.float64)
    assert np.abs(gelu_a - gelu_e).max() < 1e-6

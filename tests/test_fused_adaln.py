"""fused AdaLN (→int8) op tests (SD3 perf campaign, VERDICT r2 #3).

On CPU the public entry points use the jnp reference path; the Pallas
kernels themselves are additionally run in interpret mode here so the
block/grid indexing (per-sample modulation vectors against row-blocked
activations) is validated without a TPU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prompt_diffusion_tpu.ops.fused_adaln import (
    _adaln_kernel,
    _adaln_quant_kernel,
    _jnp_adaln,
    fused_adaln,
    fused_adaln_quant,
)


def _ref(x, s, t, eps=1e-6):
    b, n, c = x.shape
    return _jnp_adaln(x, s.reshape(b, 1, c), t.reshape(b, 1, c), eps)


def test_fused_adaln_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 64)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 1, 64)) * 0.3, jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 1, 64)) * 0.3, jnp.float32)
    out = fused_adaln(x, s, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, s, t)),
                               atol=1e-5, rtol=1e-5)


def test_fused_adaln_quant_dequant_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 128)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 1, 128)) * 0.2, jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 1, 128)) * 0.2, jnp.float32)
    oq, sa = fused_adaln_quant(x, s, t)
    assert oq.dtype == jnp.int8 and sa.shape == (2, 16, 1)
    deq = oq.astype(jnp.float32) * sa
    ref = np.asarray(_ref(x, s, t))
    err = np.abs(np.asarray(deq) - ref).max()
    assert err <= np.abs(ref).max() / 127.0 + 1e-6  # per-row quant bound


def _run_kernel_interpret(kernel, x, s, t, outs, rb):
    b, n, c = x.shape
    return pl.pallas_call(
        functools.partial(kernel, eps=1e-6),
        out_shape=outs,
        grid=(b, n // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=jax.tree_util.tree_map(
            lambda o: pl.BlockSpec(
                (1, rb, o.shape[-1]), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            outs,
        ),
        interpret=True,
    )(x, s.reshape(b, 1, c), t.reshape(b, 1, c))


def test_adaln_kernel_interpret_grid_indexing():
    """Per-sample scale/shift must pair with the right batch's row blocks."""
    rng = np.random.default_rng(2)
    b, n, c, rb = 3, 32, 64, 8
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(b, 1, c)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, c)), jnp.float32)
    out = _run_kernel_interpret(
        _adaln_kernel, x, s, t, jax.ShapeDtypeStruct((b, n, c), jnp.float32), rb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, s, t)),
                               atol=1e-5, rtol=1e-5)


def test_adaln_quant_kernel_interpret():
    rng = np.random.default_rng(3)
    b, n, c, rb = 2, 24, 128, 8
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(b, 1, c)) * 0.2, jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, 1, c)) * 0.2, jnp.float32)
    oq, sa = _run_kernel_interpret(
        _adaln_quant_kernel, x, s, t,
        [jax.ShapeDtypeStruct((b, n, c), jnp.int8),
         jax.ShapeDtypeStruct((b, n, 1), jnp.float32)], rb)
    ref_q, ref_s = fused_adaln_quant(x, s, t)  # cpu jnp path
    np.testing.assert_array_equal(np.asarray(oq), np.asarray(ref_q))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(ref_s), rtol=1e-6)


@pytest.mark.parametrize("n", [154, 333])  # SD3 context lengths: 77+77 drop-T5, 77+256 with T5
def test_fused_adaln_pallas_path_pads_odd_row_counts(n, monkeypatch):
    """The kernel path must handle N with no multiple-of-8 divisor by row
    padding (a jnp fallback here would reintroduce the HBM round-trip on
    the SD3 context stream the kernel exists to kill)."""
    import prompt_diffusion_tpu.ops.fused_adaln as fa

    monkeypatch.setattr(fa, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, n, 128)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 1, 128)) * 0.2, jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 1, 128)) * 0.2, jnp.float32)
    out = fused_adaln(x, s, t)
    assert out.shape == (2, n, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, s, t)),
                               atol=1e-5, rtol=1e-5)
    oq, sa = fused_adaln_quant(x, s, t)
    assert oq.shape == (2, n, 128) and sa.shape == (2, n, 1)
    monkeypatch.setattr(fa, "_FORCE_INTERPRET", False)
    ref_q, ref_s = fused_adaln_quant(x, s, t)  # cpu jnp path
    np.testing.assert_array_equal(np.asarray(oq), np.asarray(ref_q))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(ref_s), rtol=1e-6)


def test_fused_adaln_grad_matches_reference():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(1, 1, 32)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.normal(size=(1, 1, 32)) * 0.1, jnp.float32)
    g1 = jax.grad(lambda a, b_, c_: jnp.sum(fused_adaln(a, b_, c_) ** 2), (0, 1, 2))(x, s, t)
    g2 = jax.grad(lambda a, b_, c_: jnp.sum(_ref(a, b_, c_) ** 2), (0, 1, 2))(x, s, t)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)

"""Pallas int8 3x3 conv kernel vs the XLA int8 conv — must be bit-exact.

Integer accumulation is exact arithmetic, so the kernel and the XLA
lowering must agree to the last int32; the fp32 dequant epilogue applies
identical factors in identical order, so the final outputs match exactly
too (same dtype rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prompt_diffusion_tpu.ops.int8_conv import (
    _pick_blocks,
    conv3x3_int8,
    conv3x3_int8_supported,
)
from prompt_diffusion_tpu.ops.quant import QuantConv


def _xla_ref(xq, s_a, wq, s_w, bias, out_dtype=jnp.bfloat16):
    dn = jax.lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    o = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    out = o.astype(jnp.float32) * (
        s_a.reshape(-1, 1, 1, 1) * s_w.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 32, 48),      # single block, full Cout
    (1, 16, 8, 2048, 1024), # forces Cout blocking (w3 > budget -> cb=256)
    (1, 64, 16, 1024, 128), # forces row blocking (x block > target -> hb<h)
    (1, 16, 8, 8, 8),       # tiny, odd channel counts
])
def test_kernel_exact_vs_xla(shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (b, h, w, cin)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    s_a = jnp.asarray(rng.uniform(0.01, 0.1, (b,)), jnp.float32)
    s_w = jnp.asarray(rng.uniform(0.001, 0.01, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    want = _xla_ref(xq, s_a, wq, s_w, bias)
    for variant in ("im2col", "xshift"):
        got = conv3x3_int8(xq, s_a, wq, s_w, bias, interpret=True,
                           variant=variant)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32),
                                      err_msg=variant)


def test_kernel_no_bias_f32_out():
    rng = np.random.default_rng(1)
    xq = jnp.asarray(rng.integers(-127, 128, (1, 4, 4, 16)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 16)), jnp.int8)
    s_a = jnp.ones((1,), jnp.float32)
    s_w = jnp.ones((16,), jnp.float32)
    got = conv3x3_int8(xq, s_a, wq, s_w, None, out_dtype=jnp.float32,
                       interpret=True)
    want = _xla_ref(xq, s_a, wq, s_w, None, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_block_picker_covers_hot_shapes():
    # ALL SD1.5 UNet 3x3 sites (incl. the up-path concat monsters) must
    # route to the kernel, with legal (row, Cout) blocks
    for h, w, cin, cout in [(64, 64, 320, 320), (64, 64, 640, 320),
                            (64, 64, 960, 320), (32, 32, 640, 640),
                            (32, 32, 1920, 640), (16, 16, 1280, 1280),
                            (8, 8, 2560, 1280)]:
        assert conv3x3_int8_supported(h, w, cin, cout), (h, w, cin, cout)
        hb, cb = _pick_blocks(h, w, cin, cout)
        assert h % hb == 0 and cout % cb == 0
        assert cb == cout or cb % 128 == 0  # TPU lane tiling constraint


def test_quantconv_1x1_matches_conv_lowering():
    """The 1x1 dot fast path must equal the old conv lowering exactly."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)), jnp.float32)
    m = QuantConv(features=16, kernel_size=(1, 1), padding=0)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)

    # reference: same quantization, conv lowering
    from prompt_diffusion_tpu.ops.quant import _quant_act, _quant_weight
    xq, s_a = _quant_act(x)
    wq, s_w = _quant_weight(params["params"]["kernel"], reduce_axes=(0, 1, 2))
    dn = jax.lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    o = jax.lax.conv_general_dilated(xq, wq, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
    want = (o.astype(jnp.float32) * (s_a * s_w.reshape(1, 1, 1, -1))
            + params["params"]["bias"]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(want, np.float32))

"""ops/resize.py: the MXU matmul bilinear resize must match the exact
implementations it replaced — `jax.image.resize(..., "bilinear")` for the
half-pixel convention (UniFormer head / HED score upsamples) and torch
`F.interpolate(..., align_corners=True)` for the DPT/MLSD decoders (that
parity is asserted in tests/test_midas.py::test_resize_align_corners_matches_torch
through `_resize_align_corners`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.ops.resize import bilinear_matrix, resize_bilinear

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize(
    "h,w,new_h,new_w",
    [(16, 16, 128, 128), (128, 128, 512, 512), (3, 3, 16, 16),
     (6, 6, 16, 16), (1, 1, 16, 16), (32, 24, 64, 48)],
)
def test_half_pixel_matches_jax_image_resize(h, w, new_h, new_w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)), jnp.float32)
    ref = jax.image.resize(x, (2, new_h, new_w, 5), "bilinear")
    got = resize_bilinear(x, new_h, new_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_interp_rows_sum_to_one():
    for align in (False, True):
        for n_in, n_out in [(7, 30), (128, 512), (1, 9), (16, 16)]:
            m = bilinear_matrix(n_in, n_out, align)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
            assert (m >= 0).all()


def test_identity_when_same_size():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 3)),
                    jnp.float32)
    assert resize_bilinear(x, 8, 8) is x


def test_dtype_preserved():
    x = jnp.ones((1, 4, 4, 2), jnp.bfloat16)
    assert resize_bilinear(x, 8, 8).dtype == jnp.bfloat16

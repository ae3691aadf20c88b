"""UniFormer+UperNet segmentation annotator tests (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.annotators.uniformer import (
    UniFormerConfig,
    UniFormerSeg,
    _adaptive_avg_pool,
    ade_palette,
    colorize_segmentation,
)
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

pytestmark = pytest.mark.slow  # multi-minute on CPU; fast tier: -m 'not slow'

TINY = UniFormerConfig(embed_dims=(8, 16, 32, 64), depths=(1, 1, 2, 1),
                       head_dim=16, num_classes=150, decode_channels=32)


def test_seg_logits_shape():
    model = UniFormerSeg(config=TINY, policy=fp32_policy())
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(model.apply)(params, x)
    assert logits.shape == (2, 64, 64, 150)
    assert np.isfinite(np.asarray(logits)).all()


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 7, 9, 4)).astype(np.float32)
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 3))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_palette_and_colorize():
    pal = ade_palette()
    assert pal.shape == (150, 3) and pal.dtype == np.uint8
    cm = np.asarray([[0, 1], [2, 149]])
    out = colorize_segmentation(cm[None])
    assert out.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(out[0, 0, 0], pal[0])
    np.testing.assert_array_equal(out[0, 1, 1], pal[149])

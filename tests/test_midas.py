"""MiDaS DPT annotator tests (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.annotators.midas import (
    DPTConfig,
    DPTDepth,
    _resize_align_corners,
    depth_to_normals,
)
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

pytestmark = pytest.mark.slow  # multi-minute on CPU; fast tier: -m 'not slow'

TINY = DPTConfig(hidden_size=64, num_layers=4, num_heads=4, hooks=(0, 1, 2, 3),
                 reassemble_dims=(32, 64, 64, 64), features=32, pos_grid=4)


def test_dpt_depth_shapes():
    model = DPTDepth(config=TINY, policy=fp32_policy())
    img = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    depth = jax.jit(model.apply)(params, img)
    assert depth.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(depth)).all()
    assert float(depth.min()) >= 0.0  # relu'd inverse depth


def test_convtranspose_import_matches_torch():
    """The reassemble resample_0/1 stages are torch ConvTranspose2d;
    their flax import must include the spatial kernel flip (flax does not
    reverse spatial axes, torch does) — elementwise parity on random
    weights, the exact path real dpt_large checkpoints take."""
    import flax.linen as fnn
    import torch

    from prompt_diffusion_tpu.annotators.midas import convt_kernel

    t = torch.nn.ConvTranspose2d(6, 10, 4, stride=4)
    x = torch.randn(2, 6, 8, 8)
    with torch.no_grad():
        ref = t(x).numpy()
    m = fnn.ConvTranspose(features=10, kernel_size=(4, 4), strides=(4, 4))
    params = {"params": {
        "kernel": jnp.asarray(convt_kernel(t.weight.detach().numpy())),
        "bias": jnp.asarray(t.bias.detach().numpy())}}
    out = np.asarray(m.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(_resize_align_corners(jnp.asarray(x), 10, 14))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_depth_to_normals():
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.uniform(1, 10, size=(2, 16, 16)), jnp.float32)
    d01, normals = depth_to_normals(depth)
    d01, normals = np.asarray(d01), np.asarray(normals)
    assert d01.min() >= 0 and d01.max() <= 1 + 1e-6
    assert normals.shape == (2, 16, 16, 3)
    assert normals.min() >= 0 and normals.max() <= 1
    # unit normals before the 0.5 remap
    vec = normals * 2 - 1
    np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-5)


def test_flat_depth_normals_point_at_camera():
    depth = jnp.ones((1, 8, 8))
    _, normals = depth_to_normals(depth)
    # zero gradients → normal = (0,0,1) → mapped to (0.5, 0.5, 1.0)
    np.testing.assert_allclose(np.asarray(normals[0, 4, 4]), [0.5, 0.5, 1.0], atol=1e-5)

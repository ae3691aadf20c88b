"""Eval subsystem tests: FID math, streaming stats, RMSE, Inception shape."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.evaluation.fid import (
    FeatureStats,
    compute_stats_from_iterator,
    frechet_distance,
)
from prompt_diffusion_tpu.evaluation.mse import rmse_between_dirs


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=16)
    a = rng.normal(size=(16, 16))
    sigma = a @ a.T + np.eye(16)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_matches_scipy_sqrtm():
    import scipy.linalg

    rng = np.random.default_rng(1)
    mu1, mu2 = rng.normal(size=8), rng.normal(size=8)
    a, b = rng.normal(size=(8, 8)), rng.normal(size=(8, 8))
    s1, s2 = a @ a.T + np.eye(8), b @ b.T + np.eye(8)
    covmean = scipy.linalg.sqrtm(s1 @ s2)
    ref = (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean.real)
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(ref, rel=1e-6)


def test_frechet_distance_mean_shift():
    sigma = np.eye(4)
    mu1, mu2 = np.zeros(4), np.ones(4) * 2
    # identical covariances → FID = |mu1-mu2|²
    assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(16.0, rel=1e-6)


def test_streaming_stats_match_numpy():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(100, 8))
    stats = FeatureStats.zero(8)
    for i in range(0, 100, 32):  # uneven shards
        stats = stats.update(feats[i : i + 32])
    mu, sigma = stats.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-10)
    np.testing.assert_allclose(sigma, np.cov(feats, rowvar=False), rtol=1e-8)
    # merge across "hosts"
    s1 = FeatureStats.zero(8).update(feats[:50])
    s2 = FeatureStats.zero(8).update(feats[50:])
    mu_m, sig_m = s1.merge(s2).finalize()
    np.testing.assert_allclose(mu_m, mu, rtol=1e-10)
    np.testing.assert_allclose(sig_m, sigma, rtol=1e-8)


def test_stats_roundtrip(tmp_path):
    stats = FeatureStats.zero(4).update(np.ones((10, 4)))
    p = str(tmp_path / "s.npz")
    stats.save(p)
    loaded = FeatureStats.load(p)
    assert loaded.count == 10
    np.testing.assert_array_equal(loaded.raw_sum, stats.raw_sum)


def test_rmse_between_dirs(tmp_path):
    from PIL import Image

    a, b = tmp_path / "orig", tmp_path / "gen"
    a.mkdir(), b.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(img).save(a / "x.png")
    Image.fromarray(img + 10).save(b / "x.png")
    mean, per = rmse_between_dirs(str(a), str(b))
    assert mean == pytest.approx(10.0, abs=1e-6)
    assert per["x.png"] == pytest.approx(10.0, abs=1e-6)


def test_inception_feature_shape():
    from prompt_diffusion_tpu.evaluation.inception import InceptionV3

    model = InceptionV3()
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()

"""Native C++ data-loader tests (skipped when the toolchain is missing)."""

import os

import numpy as np
import pytest

from prompt_diffusion_tpu.native import _load_batch_pil, load_batch, native_available

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(384, 512), (512, 512), (100, 80)]):
        p = str(d / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)).save(p, quality=92)
        paths.append(p)
    png = str(d / "x.png")
    Image.fromarray(rng.integers(0, 255, (64, 48, 3)).astype(np.uint8)).save(png)
    return paths, png


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_native_matches_pil(images):
    paths, _ = images
    # dct_scale off → exact PIL-resampling parity (±1/255 quantization)
    got = load_batch(paths, 256, to_m11=True, dct_scale=False)
    ref = _load_batch_pil(paths, 256, True)
    assert got.shape == (3, 256, 256, 3)
    assert float(np.abs(got - ref).max()) < 2.5 / 255


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_native_png_and_ranges(images):
    _, png = images
    out01 = load_batch([png], 128, to_m11=False)
    assert out01.min() >= 0.0 and out01.max() <= 1.0
    out11 = load_batch([png], 128, to_m11=True)
    np.testing.assert_allclose(np.asarray(out11), np.asarray(out01) * 2 - 1, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_native_missing_file_raises(images):
    paths, _ = images
    with pytest.raises(IOError):
        load_batch([paths[0], "/nonexistent/file.jpg"], 64)


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_native_dct_scale_close_on_photos(images):
    """DCT-scaled decode must stay visually equivalent on smooth content
    (noise images are the adversarial case; use a gradient)."""
    import tempfile

    y, x = np.mgrid[0:1024, 0:1024]
    img = np.stack([(x / 4) % 256, (y / 4) % 256, ((x + y) / 8) % 256], -1).astype(np.uint8)
    p = os.path.join(tempfile.mkdtemp(), "grad.jpg")
    Image.fromarray(img).save(p, quality=95)
    a = load_batch([p], 512, dct_scale=True)
    b = load_batch([p], 512, dct_scale=False)
    assert float(np.abs(a - b).mean()) < 0.01


def test_pil_fallback(images):
    paths, _ = images
    out = _load_batch_pil(paths, 128, False)
    assert out.shape == (3, 128, 128, 3)


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_per_file_pil_fallback_in_batch(images):
    """A format the native decoder doesn't speak hiding behind a .jpg
    name (BMP here — web scrapes are full of mislabeled files) must fall
    back to PIL for THAT file only, not abort the batch."""
    import tempfile

    paths, _ = images
    rng = np.random.default_rng(3)
    img = (rng.random((96, 80, 3)) * 255).astype(np.uint8)
    p = os.path.join(tempfile.mkdtemp(), "mislabeled.jpg")
    Image.fromarray(img).save(p, format="BMP")  # BMP bytes, .jpg name
    batch = [paths[0], p, paths[1]]
    out = load_batch(batch, 64)
    ref = _load_batch_pil(batch, 64, False)
    assert out.shape == (3, 64, 64, 3)
    # the mislabeled slot comes from PIL → exactly equal to the PIL ref
    np.testing.assert_allclose(out[1], ref[1], atol=1e-6)
    assert np.isfinite(out).all()

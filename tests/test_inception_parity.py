"""Inception-v3 FID extractor parity (VERDICT r2 next-round #7).

`evaluation/inception.py` (Flax) had no architecture-level verification.
This file restates the pt_inception FID architecture in plain torch —
pytorch-fid's `inception.py` FIDInception blocks as loaded by the
reference detector (eval/fid.py:34): TF-Slim stem, InceptionA/C/E avg
pools with count_include_pad=False, and the Mixed_7c MAX-pool quirk
(FIDInceptionE_2, a deliberate bug-for-bug match with the original
TF-FID) — then drives random weights through `load_inception_params`'s
.pth importer and requires elementwise agreement. Same no-weights-needed
pattern as tests/sd3_torch_fixture.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.evaluation.inception import InceptionV3, load_inception_params


class ConvBN(nn.Module):
    def __init__(self, cin, cout, **conv_kwargs):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **conv_kwargs)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):  # FID quirk: count_include_pad=False
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class FidA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = ConvBN(cin, 64, kernel_size=1)
        self.branch5x5_1 = ConvBN(cin, 48, kernel_size=1)
        self.branch5x5_2 = ConvBN(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = ConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = ConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = ConvBN(96, 96, kernel_size=3, padding=1)
        self.branch_pool = ConvBN(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b5, bd, bp], 1)


class FidB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = ConvBN(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = ConvBN(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = ConvBN(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = ConvBN(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class FidC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = ConvBN(cin, 192, kernel_size=1)
        self.branch7x7_1 = ConvBN(cin, c7, kernel_size=1)
        self.branch7x7_2 = ConvBN(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = ConvBN(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = ConvBN(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = ConvBN(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = ConvBN(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = ConvBN(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = ConvBN(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = ConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg(x))
        return torch.cat([b1, b7, bd, bp], 1)


class FidD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = ConvBN(cin, 192, kernel_size=1)
        self.branch3x3_2 = ConvBN(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = ConvBN(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = ConvBN(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = ConvBN(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = ConvBN(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class FidE(nn.Module):
    def __init__(self, cin, last_pool):
        super().__init__()
        self.last_pool = last_pool
        self.branch1x1 = ConvBN(cin, 320, kernel_size=1)
        self.branch3x3_1 = ConvBN(cin, 384, kernel_size=1)
        self.branch3x3_2a = ConvBN(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = ConvBN(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = ConvBN(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = ConvBN(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = ConvBN(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = ConvBN(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = ConvBN(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.last_pool == "avg":
            bp = _avg(x)
        else:  # FIDInceptionE_2: MAX pool (TF-FID bug, kept bug-for-bug)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class PtInceptionFixture(nn.Module):
    """pytorch-fid InceptionV3 (pool3/2048 head); state_dict keys match the
    pt_inception-2015-12-05 checkpoint layout consumed by our importer."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = ConvBN(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = ConvBN(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = ConvBN(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = ConvBN(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = ConvBN(80, 192, kernel_size=3)
        self.Mixed_5b = FidA(192, 32)
        self.Mixed_5c = FidA(256, 64)
        self.Mixed_5d = FidA(288, 64)
        self.Mixed_6a = FidB(288)
        self.Mixed_6b = FidC(768, 128)
        self.Mixed_6c = FidC(768, 160)
        self.Mixed_6d = FidC(768, 160)
        self.Mixed_6e = FidC(768, 192)
        self.Mixed_7a = FidD(768)
        self.Mixed_7b = FidE(1280, "avg")
        self.Mixed_7c = FidE(2048, "max")

    def forward(self, x01):
        x = x01 * 2.0 - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))  # (B, 2048)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(1 + torch.randn(m.weight.shape, generator=g) * 0.1)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=g))


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    fix = PtInceptionFixture().eval()
    _randomize(fix)
    # round-trip through the REAL importer: save a .pth in the pt_inception
    # key layout and load it with load_inception_params
    path = str(tmp_path_factory.mktemp("incep") / "pt_inception_random.pth")
    torch.save(fix.state_dict(), path)
    params = load_inception_params(path)
    return fix, params


@pytest.mark.slow
def test_inception_parity_299(pair):
    """Native-resolution elementwise parity (no resize in the loop)."""
    fix, params = pair
    x = np.random.default_rng(0).uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = fix(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(InceptionV3().apply(params, jnp.asarray(x)))
    assert np.abs(ref).max() > 0
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_inception_parity_with_upsample(pair):
    """75² input → internal bilinear upsample to 299² (pytorch-fid
    resize_input path: F.interpolate(..., mode='bilinear',
    align_corners=False) == jax.image.resize half-pixel bilinear)."""
    fix, params = pair
    x = np.random.default_rng(1).uniform(0, 1, (2, 75, 75, 3)).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        xt = F.interpolate(xt, size=(299, 299), mode="bilinear", align_corners=False)
        ref = fix(xt).numpy()
    ours = np.asarray(InceptionV3().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_inception_parity_with_downsample(pair):
    """512²-style DOWNSCALE (the real generated-image path): jax's
    default antialias=True diverges from pytorch-fid's plain
    F.interpolate here — the model must use antialias=False."""
    fix, params = pair
    x = np.random.default_rng(2).uniform(0, 1, (2, 384, 384, 3)).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        xt = F.interpolate(xt, size=(299, 299), mode="bilinear", align_corners=False)
        ref = fix(xt).numpy()
    ours = np.asarray(InceptionV3().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)

"""DPT-Hybrid MiDaS parity (VERDICT r2 next-round #5).

The reference's DEFAULT depth annotator is MiDaSInference(dpt_hybrid)
(`annotator/midas/__init__.py:11`; ckpt dpt_hybrid-midas-501f0c75.pt,
api.py:23,40) on the timm `vit_base_resnet50_384` backbone. timm is not
installed, so — exactly like tests/sd3_torch_fixture.py — this file
restates the hybrid model in plain torch with the REAL checkpoint key
scheme (stem/stages StdConv+GroupNorm ResNetV2, ViT-B blocks,
act_postprocess3/4, scratch decoder), saves a .pth, round-trips it
through `import_dpt_checkpoint`'s hybrid branch, and requires elementwise
agreement with `DPTHybridDepth`.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.annotators.midas import (
    DPTHybridConfig,
    DPTHybridDepth,
    create_dpt,
    import_dpt_checkpoint,
)
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

pytestmark = pytest.mark.slow  # ~1 min CPU (full ViT-B + R50 at 128²)


def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    """timm StdConv2dSame: TF-SAME pad + weight-standardized conv."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride=stride, bias=False)
        self.k, self.s = k, stride

    def forward(self, x):
        x = _pad_same(x, self.k, self.s)
        v, m = torch.var_mean(self.weight, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (self.weight - m) / torch.sqrt(v + 1e-6)
        return F.conv2d(x, w, None, self.stride)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, c, act=True):
        super().__init__(32, c, eps=1e-5)
        self.act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.act else x


class Downsample(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = StdConv2dSame(cin, cout, 1, stride)
        self.norm = GroupNormAct(cout, act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    def __init__(self, cin, cout, stride=1, downsample=False):
        super().__init__()
        mid = cout // 4
        self.downsample = Downsample(cin, cout, stride) if downsample else None
        self.conv1 = StdConv2dSame(cin, mid, 1)
        self.norm1 = GroupNormAct(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride)
        self.norm2 = GroupNormAct(mid)
        self.conv3 = StdConv2dSame(mid, cout, 1)
        self.norm3 = GroupNormAct(cout, act=False)

    def forward(self, x):
        sc = x if self.downsample is None else self.downsample(x)
        x = self.norm1(self.conv1(x))
        x = self.norm2(self.conv2(x))
        x = self.norm3(self.conv3(x))
        return F.relu(x + sc)


class Stage(nn.Module):
    def __init__(self, cin, cout, depth, stride):
        super().__init__()
        blocks = [Bottleneck(cin, cout, stride, downsample=True)]
        blocks += [Bottleneck(cout, cout) for _ in range(depth - 1)]
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = StdConv2dSame(3, 64, 7, 2)
        self.norm = GroupNormAct(64)

    def forward(self, x):
        x = self.norm(self.conv(x))
        x = _pad_same(x, 3, 2)
        return F.max_pool2d(x, 3, 2)


class Backbone(nn.Module):
    """timm ResNetV2 (layers=(3,4,9), preact=False, stem_type='same')."""

    def __init__(self, layers=(3, 4, 9)):
        super().__init__()
        self.stem = Stem()
        widths = (256, 512, 1024)
        stages, cin = [], 64
        for s, d in enumerate(layers):
            stages.append(Stage(cin, widths[s], d, 1 if s == 0 else 2))
            cin = widths[s]
        self.stages = nn.Sequential(*stages)


class HybridEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone()
        self.proj = nn.Conv2d(1024, 768, 1)


class Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(b, n, d))


class Mlp(nn.Module):
    def __init__(self, dim=768, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class VitModel(nn.Module):
    def __init__(self, num_layers=12, pos_grid=24):
        super().__init__()
        self.patch_embed = HybridEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, 768))
        self.pos_embed = nn.Parameter(torch.zeros(1, pos_grid * pos_grid + 1, 768))
        self.blocks = nn.ModuleList([Block() for _ in range(num_layers)])
        self.pos_grid = pos_grid


class ProjectReadout(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, x):
        readout = x[:, 0].unsqueeze(1).expand_as(x[:, 1:])
        return self.project(torch.cat((x[:, 1:], readout), -1))


class RCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class Fusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = RCU(f)
        self.resConfUnit2 = RCU(f)
        self.out_conv = nn.Conv2d(f, f, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self, dims=(256, 512, 768, 768), f=256):
        super().__init__()
        for i, d in enumerate(dims):
            setattr(self, f"layer{i + 1}_rn", nn.Conv2d(d, f, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(self, f"refinenet{i}", Fusion(f))
        self.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, padding=1), nn.Identity(),
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU(), nn.Identity())


class Pretrained(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = VitModel()
        self.act_postprocess3 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(), nn.Conv2d(768, 768, 1))
        self.act_postprocess4 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(), nn.Conv2d(768, 768, 1),
            nn.Conv2d(768, 768, 3, stride=2, padding=1))


class DPTHybridFixture(nn.Module):
    """Full dpt_hybrid forward (midas/dpt_depth.py DPT.forward +
    vit.py forward_vit/forward_flex hybrid path), real ckpt key names."""

    def __init__(self):
        super().__init__()
        self.pretrained = Pretrained()
        self.scratch = Scratch()

    def forward(self, x):  # (B,3,H,W) in [-1,1] → (B,H,W)
        m = self.pretrained.model
        b = x.shape[0]
        gh, gw = x.shape[-2] // 16, x.shape[-1] // 16

        h = m.patch_embed.backbone.stem(x)
        h = m.patch_embed.backbone.stages[0](h)
        layer_1 = h
        h = m.patch_embed.backbone.stages[1](h)
        layer_2 = h
        h = m.patch_embed.backbone.stages[2](h)
        t = m.patch_embed.proj(h).flatten(2).transpose(1, 2)

        # forward_flex: resized pos embed + cls token
        pos = m.pos_embed
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(1, m.pos_grid, m.pos_grid, -1).permute(0, 3, 1, 2)
        pos_grid = F.interpolate(pos_grid, size=(gh, gw), mode="bilinear",
                                 align_corners=False)
        pos_grid = pos_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        pos = torch.cat([pos_cls, pos_grid], dim=1)
        t = torch.cat([m.cls_token.expand(b, -1, -1), t], dim=1) + pos

        taps = []
        for i, blk in enumerate(m.blocks):
            t = blk(t)
            if i in (8, 11):
                taps.append(t)

        def unflatten(z):
            return z.transpose(1, 2).reshape(b, -1, gh, gw)

        layer_3 = self.pretrained.act_postprocess3[3:](
            unflatten(self.pretrained.act_postprocess3[0](taps[0])))
        layer_4 = self.pretrained.act_postprocess4[3:](
            unflatten(self.pretrained.act_postprocess4[0](taps[1])))

        s = self.scratch
        p1 = s.layer1_rn(layer_1)
        p2 = s.layer2_rn(layer_2)
        p3 = s.layer3_rn(layer_3)
        p4 = s.layer4_rn(layer_4)
        h = s.refinenet4(p4)
        h = s.refinenet3(h, p3)
        h = s.refinenet2(h, p2)
        h = s.refinenet1(h, p1)
        # head (dpt_depth.py:91-99): conv → ×2 interpolate(align_corners) →
        # conv → relu → conv → relu
        h = s.output_conv[0](h)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
        for m in s.output_conv[2:]:
            h = m(h)
        return h.squeeze(1)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name and name.endswith("weight"):
                p.copy_(1 + torch.randn(p.shape, generator=g) * 0.1)
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_dpt_hybrid_parity(tmp_path):
    fix = DPTHybridFixture().eval()
    _randomize(fix)
    path = str(tmp_path / "dpt_hybrid_random.pt")
    torch.save(fix.state_dict(), path)

    params = import_dpt_checkpoint(path)
    assert "stem_conv" in params["params"], "hybrid branch must be sniffed"
    model = DPTHybridDepth(config=DPTHybridConfig(), policy=fp32_policy())

    x = np.random.default_rng(0).uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = fix(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 128, 128)
    assert np.abs(ref).max() > 0
    # random weights make activations O(1000) through the 50-block
    # backbone; 123M-param fp32 nets accumulate ~1e-3 relative conv noise
    # (observed max |Δ| 0.34 on values ~500, relative 7e-4)
    np.testing.assert_allclose(out, ref, atol=0.5, rtol=2e-3)


def test_create_dpt_dispatch(tmp_path):
    """create_dpt returns DPTHybridDepth for the hybrid key scheme."""
    fix = DPTHybridFixture().eval()
    path = str(tmp_path / "h.pt")
    torch.save(fix.state_dict(), path)
    model, params = create_dpt(path)
    assert isinstance(model, DPTHybridDepth)

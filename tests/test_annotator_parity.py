"""Annotator weight-parity tests (VERDICT round-1 missing #5 / weak #4).

Each test instantiates the REFERENCE torch annotator network from
/root/reference/annotator with random weights, round-trips its state dict
through our importer, and requires elementwise agreement with the Flax
port — proving the import math produces working detectors, the same
pattern tests/test_torch_parity.py uses for the core models.

MiDaS' DPT and the reference ViT need timm (not installed), so the DPT
test covers the decoder blocks the reference defines itself
(blocks.py FeatureFusionBlock_custom / ResidualConvUnit_custom); the
UniFormer test executes the vendored backbone source with the three
timm/mmcv symbols stubbed (they're unused at inference).
"""

import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from prompt_diffusion_tpu.utils.dtypes import fp32_policy


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib.machinery

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # vit.py does `import timm` at module level but only calls it when
    # building pretrained encoders; midas/api.py pulls torchvision for its
    # preprocessing Compose (unused here)
    stub("timm")
    tv = stub("torchvision")
    tvt = stub("torchvision.transforms", Compose=lambda fns: fns)
    tv.transforms = tvt
    yield


def _randomize(module, seed, std=0.08):
    """Random weights with controlled activation scale: fan-in-scaled for
    conv/linear kernels (keeps 20+-layer nets at O(1) activations so fp32
    tolerances are meaningful), `std` for everything else."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            r = torch.randn(p.shape, generator=g)
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(r / max(fan_in, 1) ** 0.5)
            else:
                p.copy_(r * std)
        for b in module.buffers():  # BN running stats
            if b.dtype.is_floating_point:
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)
            else:
                b.zero_()
    return module


def test_hed_parity(tmp_path):
    from annotator.hed import Network

    with mock.patch.object(torch, "load", return_value={}), \
         mock.patch.object(torch.nn.Module, "load_state_dict", lambda *a, **k: None):
        net = Network("unused.pth")
    net = _randomize(net, 0).eval()
    path = tmp_path / "hed.pth"
    torch.save(net.state_dict(), path)

    bgr01 = torch.rand((2, 3, 64, 64), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = net(bgr01).numpy()[:, 0]  # (B,H,W)

    from prompt_diffusion_tpu.annotators.hed import HEDNetwork, import_hed_checkpoint

    params = import_hed_checkpoint(str(path))
    # ours takes RGB [0,255] NHWC and does the BGR flip + mean-sub inside
    rgb255 = (bgr01.numpy().transpose(0, 2, 3, 1)[..., ::-1] * 255.0).copy()
    out = HEDNetwork(policy=fp32_policy()).apply(params, jnp.asarray(rgb255))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_mlsd_parity(tmp_path):
    from annotator.mlsd.models.mbv2_mlsd_large import MobileV2_MLSD_Large

    net = _randomize(MobileV2_MLSD_Large(), 2, std=0.05).eval()
    path = tmp_path / "mlsd.pth"
    torch.save(net.state_dict(), path)

    x = torch.rand((1, 4, 64, 64), generator=torch.Generator().manual_seed(3)) * 2 - 1
    with torch.no_grad():
        ref = net(x).numpy()  # (B,9,H/2,W/2) — reference slices [:,7:] itself

    from prompt_diffusion_tpu.annotators.mlsd import MLSDNet, import_mlsd_checkpoint

    params = import_mlsd_checkpoint(str(path))
    out = MLSDNet(policy=fp32_policy()).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=3e-4, rtol=1e-3
    )


def _openpose_models():
    """Load annotator/openpose/model.py standalone — the package __init__
    pulls in torchvision (not needed for the nets themselves)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_openpose_model", f"{REF}/annotator/openpose/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_openpose_body_parity(tmp_path):
    bodypose_model = _openpose_models().bodypose_model

    net = _randomize(bodypose_model(), 4, std=0.05).eval()
    path = tmp_path / "body.pth"
    torch.save(net.state_dict(), path)

    x = torch.rand((1, 3, 64, 64), generator=torch.Generator().manual_seed(5)) - 0.5
    with torch.no_grad():
        paf_ref, heat_ref = [t.numpy() for t in net(x)]

    from prompt_diffusion_tpu.annotators.openpose import (
        BodyPoseNet,
        import_body_checkpoint,
    )

    params = import_body_checkpoint(str(path))
    paf, heat = BodyPoseNet(policy=fp32_policy()).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(paf).transpose(0, 3, 1, 2), paf_ref,
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(heat).transpose(0, 3, 1, 2), heat_ref,
                               atol=3e-4, rtol=1e-3)


def test_openpose_hand_parity(tmp_path):
    handpose_model = _openpose_models().handpose_model

    net = _randomize(handpose_model(), 6, std=0.05).eval()
    path = tmp_path / "hand.pth"
    torch.save(net.state_dict(), path)

    x = torch.rand((1, 3, 64, 64), generator=torch.Generator().manual_seed(7)) - 0.5
    with torch.no_grad():
        ref = net(x).numpy()

    from prompt_diffusion_tpu.annotators.openpose import (
        HandPoseNet,
        import_hand_checkpoint,
    )

    params = import_hand_checkpoint(str(path))
    out = HandPoseNet(policy=fp32_policy()).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=1e-3)


def test_midas_fusion_block_parity():
    """The DPT decoder blocks the reference defines in-tree
    (annotator/midas/midas/blocks.py:231-334) vs our FeatureFusion/RCU."""
    from annotator.midas.midas.blocks import FeatureFusionBlock_custom

    feats = 8
    blk = _randomize(
        FeatureFusionBlock_custom(feats, torch.nn.ReLU(False), deconv=False,
                                  bn=False, expand=False, align_corners=True),
        8,
    ).eval()
    sd = {k: v.numpy() for k, v in blk.state_dict().items()}
    conv = lambda w: w.transpose(2, 3, 1, 0)
    params = {"params": {
        "rcu1": {
            "conv1": {"kernel": conv(sd["resConfUnit1.conv1.weight"]),
                      "bias": sd["resConfUnit1.conv1.bias"]},
            "conv2": {"kernel": conv(sd["resConfUnit1.conv2.weight"]),
                      "bias": sd["resConfUnit1.conv2.bias"]},
        },
        "rcu2": {
            "conv1": {"kernel": conv(sd["resConfUnit2.conv1.weight"]),
                      "bias": sd["resConfUnit2.conv1.bias"]},
            "conv2": {"kernel": conv(sd["resConfUnit2.conv2.weight"]),
                      "bias": sd["resConfUnit2.conv2.bias"]},
        },
        "out_conv": {"kernel": conv(sd["out_conv.weight"]), "bias": sd["out_conv.bias"]},
    }}

    from prompt_diffusion_tpu.annotators.midas import FeatureFusion

    g = torch.Generator().manual_seed(9)
    x = torch.randn((1, feats, 8, 8), generator=g)
    skip = torch.randn((1, feats, 8, 8), generator=g)
    ff = FeatureFusion(feats, fp32_policy())
    with torch.no_grad():
        ref2 = blk(x, skip).numpy()
        ref1 = blk(x).numpy()
    out2 = ff.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(skip.numpy().transpose(0, 2, 3, 1)))
    out1 = ff.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out2).transpose(0, 3, 1, 2), ref2,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out1).transpose(0, 3, 1, 2), ref1,
                               atol=2e-4, rtol=1e-3)


def _load_reference_uniformer():
    """Exec the vendored backbone source (mmseg/models/backbones/uniformer.py)
    with its three unused-at-inference imports stubbed."""
    src_path = f"{REF}/annotator/uniformer/mmseg/models/backbones/uniformer.py"
    with open(src_path) as f:
        lines = f.readlines()
    kept = []
    for ln in lines:
        s = ln.strip()
        if s.startswith(("from annotator.", "from ..builder", "from timm.")):
            continue
        if s.startswith("@BACKBONES"):
            continue
        kept.append(ln)

    class DropPath(torch.nn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    ns = {
        "torch": torch,
        "DropPath": DropPath,
        "to_2tuple": lambda v: (v, v) if not isinstance(v, tuple) else v,
        "trunc_normal_": torch.nn.init.trunc_normal_,
        "load_checkpoint": None,
        "get_root_logger": lambda: None,
        "BACKBONES": None,
    }
    exec(compile("".join(kept), src_path, "exec"), ns)
    return ns["UniFormer"]


def test_uniformer_backbone_parity():
    UniFormer = _load_reference_uniformer()
    depths = (1, 1, 1, 1)
    dims = (8, 16, 32, 64)
    net = UniFormer(layers=list(depths), embed_dim=list(dims), head_dim=16,
                    drop_path_rate=0.0)
    net = _randomize(net, 10, std=0.05).eval()

    from prompt_diffusion_tpu.annotators.uniformer import (
        UniFormerBackbone,
        UniFormerConfig,
        import_uniformer_backbone,
    )

    cfg = UniFormerConfig(embed_dims=dims, depths=depths, head_dim=16)
    sd = {f"backbone.{k}": v.numpy() for k, v in net.state_dict().items()}

    x = torch.rand((1, 3, 64, 64), generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        refs = [t.numpy() for t in net(x)]

    bb = import_uniformer_backbone(sd, cfg)
    outs = UniFormerBackbone(config=cfg, policy=fp32_policy()).apply(
        {"params": bb}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    for ours, theirs in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=3e-4, rtol=1e-3
        )

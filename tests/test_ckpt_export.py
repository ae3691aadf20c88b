"""Checkpoint EXPORT round-trip tests (VERDICT round-1 missing #4).

The reference round-trips torch checkpoints (`tool_add_control.py:36-77`,
`cldm/model.py:12-28`, diffusers save_pretrained hooks); these tests prove
our params survive export → reference format → import unchanged, with
FULL leaf coverage in both directions (a dropped key fails the test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_diffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
from prompt_diffusion_tpu.tools.torch_import import (
    export_ldm_checkpoint,
    import_ldm_checkpoint,
)

TINY_UNET = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                       attention_resolutions=(1,), num_heads=4, context_dim=64)


pytestmark = pytest.mark.slow  # multi-minute on CPU; fast tier: -m 'not slow'


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_leaves(v, f"{prefix}/{k}"))
        return out
    return {prefix: np.asarray(tree)}


def _assert_tree_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert set(la) == set(lb), (
        f"leaf sets differ; only in a: {sorted(set(la) - set(lb))[:10]}; "
        f"only in b: {sorted(set(lb) - set(la))[:10]}"
    )
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg=k)


@pytest.fixture(scope="module")
def tiny_params():
    pipe = PromptDiffusionSD15(
        unet=UNetSD15(config=TINY_UNET),
        controlnet=ControlNetSD15(config=TINY_UNET),
        vae=AutoencoderKL(config=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)),
        text_encoder=CLIPTextModel(config=CLIPTextConfig(
            vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128)),
        schedule=DiffusionSchedule.create(),
    )
    params = jax.jit(lambda r: pipe.init_params(r, image_size=64))(jax.random.PRNGKey(3))
    # randomize so zero-init layers aren't trivially equal
    i = [0]

    def jiggle(x):
        i[0] += 1
        return x + 0.1 * jax.random.normal(jax.random.PRNGKey(i[0]), x.shape, x.dtype)

    return jax.tree_util.tree_map(jiggle, params)


def test_ldm_ckpt_roundtrip(tiny_params, tmp_path):
    path = str(tmp_path / "export.ckpt")
    export_ldm_checkpoint(tiny_params, path, unet_cfg=TINY_UNET,
                          vae_ch_mult=(1, 1, 2, 2), vae_num_res_blocks=1,
                          clip_layers=2)
    back = import_ldm_checkpoint(path, unet_cfg=TINY_UNET,
                                 vae_ch_mult=(1, 1, 2, 2), vae_num_res_blocks=1,
                                 clip_layers=2)
    _assert_tree_equal(tiny_params, back)


def test_ldm_export_loads_in_reference_loader(tiny_params, tmp_path):
    """The exported file must load through the reference's own entry point
    (cldm/model.py:12-21 load_state_dict semantics: torch.load → state_dict
    unwrap) and carry the four reference namespaces."""
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "export.ckpt")
    export_ldm_checkpoint(tiny_params, path, unet_cfg=TINY_UNET,
                          vae_ch_mult=(1, 1, 2, 2), vae_num_res_blocks=1,
                          clip_layers=2)
    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = raw["state_dict"]
    spaces = {k.split(".")[0] for k in sd}
    assert spaces == {"model", "control_model", "first_stage_model", "cond_stage_model"}
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    # conv layout is torch OIHW: 3x3 input conv has shape (C,4,3,3)
    w = sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert w.shape[1:] == (4, 3, 3)


def test_diffusers_controlnet_roundtrip(tiny_params, tmp_path):
    from prompt_diffusion_tpu.tools.diffusers_import import (
        diffusers_controlnet_rules,
        export_diffusers_controlnet,
        load_component_state,
    )
    from prompt_diffusion_tpu.tools.torch_import import apply_rules

    folder = str(tmp_path / "controlnet")
    export_diffusers_controlnet(tiny_params["controlnet"], folder, cfg=TINY_UNET)
    sd = load_component_state(folder)
    back = {"params": apply_rules(sd, diffusers_controlnet_rules(TINY_UNET))}
    _assert_tree_equal(tiny_params["controlnet"], back)


def test_sd3_controlnet_roundtrip(tmp_path):
    from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet, SupportPairDownProj
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig
    from prompt_diffusion_tpu.tools.diffusers_import import (
        export_sd3_controlnet,
        load_component_state,
        sd3_controlnet_rules,
    )
    from prompt_diffusion_tpu.tools.torch_import import apply_rules

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4, num_layers=2,
                      attention_head_dim=16, num_attention_heads=4,
                      joint_attention_dim=32, caption_projection_dim=64,
                      pooled_projection_dim=48, out_channels=4, pos_embed_max_size=12)
    cnet = SD3ControlNet(config=cfg)
    dp = SupportPairDownProj()
    lat = jnp.zeros((1, 8, 8, 4))
    cparams = jax.jit(cnet.init)(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), lat, lat,
                                 jnp.zeros((1, 5, 32)), jnp.zeros((1, 48)))
    dparams = jax.jit(dp.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                               jnp.zeros((1, 16, 16, 3)))
    params = {"controlnet": cparams, "down_proj": dparams}

    folder = str(tmp_path / "sd3_controlnet")
    export_sd3_controlnet(params, folder, num_layers=2)
    sd = load_component_state(folder)
    tree = apply_rules(sd, sd3_controlnet_rules(2))
    down = tree.pop("down_proj")
    _assert_tree_equal(cparams, {"params": tree})
    _assert_tree_equal(dparams, {"params": {"down_proj": down}})

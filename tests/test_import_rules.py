"""Checkpoint-import rule consistency tests.

Both reference formats (ldm single-file, diffusers folders) must map onto
the SAME set of Flax parameter paths — any divergence means one importer
silently drops weights. This cross-checks the two rule tables and checks
coverage against real init trees.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
from prompt_diffusion_tpu.tools.diffusers_import import (
    diffusers_controlnet_rules,
    diffusers_unet_rules,
)
from prompt_diffusion_tpu.tools.torch_import import unet_key_rules
from prompt_diffusion_tpu.utils.dtypes import fp32_policy

CFG = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                 attention_resolutions=(1, 2), num_heads=4, context_dim=64)


def _flax_paths(rules):
    return {(fp, kind) for _, fp, kind in rules}


def test_unet_rules_agree_across_formats():
    ldm = _flax_paths(unet_key_rules(CFG))
    dif = _flax_paths(diffusers_unet_rules(CFG))
    assert ldm == dif, f"only-ldm: {sorted(ldm - dif)[:5]} only-diffusers: {sorted(dif - ldm)[:5]}"


def test_controlnet_rules_agree_across_formats():
    ldm = _flax_paths(unet_key_rules(CFG, is_controlnet=True))
    dif = _flax_paths(diffusers_controlnet_rules(CFG))
    assert ldm == dif, f"only-ldm: {sorted(ldm - dif)[:5]} only-diffusers: {sorted(dif - ldm)[:5]}"


def _param_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _param_paths(v, p)
        else:
            out.add(p)
    return out


def test_unet_rules_cover_init_tree():
    """Every param of a real init must be writable by the rules (module and
    importer stay in lockstep)."""
    unet = UNetSD15(config=CFG, policy=fp32_policy())
    params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 64)),
    )["params"]
    tree_paths = _param_paths(params)
    rule_leaf_paths = set()
    for _, fp, kind in unet_key_rules(CFG):
        if kind in ("norm", "norm_ln"):
            rule_leaf_paths |= {f"{fp}/scale", f"{fp}/bias"}
        else:
            rule_leaf_paths |= {f"{fp}/kernel", f"{fp}/bias"}
    missing = {p for p in tree_paths if p not in rule_leaf_paths}
    assert not missing, sorted(missing)[:10]


def test_sd3_transformer_rules_cover_init_tree():
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig, SD3Transformer
    from prompt_diffusion_tpu.tools.diffusers_import import sd3_transformer_rules

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4, num_layers=2,
                      attention_head_dim=16, num_attention_heads=4,
                      joint_attention_dim=64, caption_projection_dim=64,
                      pooled_projection_dim=64, out_channels=4, pos_embed_max_size=16)
    model = SD3Transformer(config=cfg, policy=fp32_policy())
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 10, 64)),
        jnp.zeros((1, 64)),
    )["params"]
    tree_paths = _param_paths(params)
    rule_leaf_paths = set()
    for _, fp, kind in sd3_transformer_rules(num_layers=2):
        rule_leaf_paths |= {f"{fp}/kernel", f"{fp}/bias"}
    missing = {p for p in tree_paths if p not in rule_leaf_paths}
    assert not missing, sorted(missing)[:10]


def test_sd3_controlnet_rules_cover_init_tree():
    from prompt_diffusion_tpu.models.controlnet_sd3 import SD3ControlNet
    from prompt_diffusion_tpu.models.mmdit_sd3 import MMDiTConfig
    from prompt_diffusion_tpu.tools.diffusers_import import sd3_controlnet_rules

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4, num_layers=2,
                      attention_head_dim=16, num_attention_heads=4,
                      joint_attention_dim=64, caption_projection_dim=64,
                      pooled_projection_dim=64, out_channels=4, pos_embed_max_size=16)
    model = SD3ControlNet(config=cfg, policy=fp32_policy())
    lat = jnp.zeros((1, 8, 8, 4))
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), lat, jnp.zeros((1,)), lat, lat,
        jnp.zeros((1, 10, 64)), jnp.zeros((1, 64)),
    )["params"]
    tree_paths = _param_paths(params)
    rule_leaf_paths = set()
    for _, fp, kind in sd3_controlnet_rules(num_layers=2):
        rule_leaf_paths |= {f"{fp}/kernel", f"{fp}/bias"}
        # pos_embed_input maps onto a bare Conv param node
    missing = {p for p in tree_paths if p not in rule_leaf_paths}
    assert not missing, sorted(missing)[:10]


def test_controlnet_rules_cover_init_tree():
    cnet = ControlNetSD15(config=CFG, hint_channels=6, policy=fp32_policy())
    params = jax.eval_shape(
        cnet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 128, 128, 6)), jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 7, 64)),
    )["params"]
    tree_paths = _param_paths(params)
    rule_leaf_paths = set()
    for _, fp, kind in unet_key_rules(CFG, is_controlnet=True):
        if kind in ("norm", "norm_ln"):
            rule_leaf_paths |= {f"{fp}/scale", f"{fp}/bias"}
        else:
            rule_leaf_paths |= {f"{fp}/kernel", f"{fp}/bias"}
    missing = {p for p in tree_paths if p not in rule_leaf_paths}
    assert not missing, sorted(missing)[:10]

"""HF-diffusers checkpoint folders → Flax params.

The reference publishes a second checkpoint format:
`zhendongw/prompt-diffusion-diffusers` (README.md:84-85) — diffusers
`save_pretrained` folders with `diffusion_pytorch_model.safetensors` per
component (unet/, controlnet/, vae/, text_encoder/). This module maps
those key schemes onto the same Flax models the ldm importer targets:

  * UNet2DConditionModel        → models.unet_sd15.UNetSD15
  * PromptDiffusionControlNetModel (promptdiffusioncontrolnet.py:31-391)
                                → models.controlnet_sd15.ControlNetSD15
  * AutoencoderKL (diffusers)   → models.vae.AutoencoderKL
  * CLIPTextModel               → models.clip_text.CLIPTextModel

Differences handled: block-indexed (down_blocks.l.resnets.i) vs
sequential (input_blocks.i) naming; diffusers VAE attention uses Linear
q/k/v/out vs ldm 1×1 convs; the diffusers ControlNet's two
ControlNetConditioningEmbedding stacks (6-ch pair + 3-ch query,
promptdiffusioncontrolnet.py:177-186) map onto the two HintEncoders.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig
from prompt_diffusion_tpu.tools.torch_import import (
    _conv,
    _linear,
    _set,
    apply_rules,
    clip_key_rules,
)


def load_component_state(folder: str) -> Dict[str, np.ndarray]:
    """Load a diffusers component folder (safetensors preferred)."""
    st = os.path.join(folder, "diffusion_pytorch_model.safetensors")
    if not os.path.exists(st):
        st = os.path.join(folder, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return dict(load_file(st))
    bin_path = os.path.join(folder, "diffusion_pytorch_model.bin")
    if not os.path.exists(bin_path):
        bin_path = os.path.join(folder, "pytorch_model.bin")
    import torch

    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# diffusers UNet / ControlNet encoder keys → ldm-style sequential indices
# ---------------------------------------------------------------------------

def _res_rules(tp: str, fp: str):
    return [
        (f"{tp}.norm1", f"{fp}/in_norm", "norm"),
        (f"{tp}.conv1", f"{fp}/in_conv", "conv"),
        (f"{tp}.time_emb_proj", f"{fp}/emb_proj", "linear"),
        (f"{tp}.norm2", f"{fp}/out_norm", "norm"),
        (f"{tp}.conv2", f"{fp}/out_conv", "conv"),
        (f"{tp}.conv_shortcut", f"{fp}/skip", "conv"),
    ]


def _attn_rules(tp: str, fp: str, depth: int = 1):
    rules = [
        (f"{tp}.norm", f"{fp}/norm", "norm"),
        (f"{tp}.proj_in", f"{fp}/proj_in", "conv"),
        (f"{tp}.proj_out", f"{fp}/proj_out", "conv"),
    ]
    for d in range(depth):
        tb, fb = f"{tp}.transformer_blocks.{d}", f"{fp}/block_{d}"
        for a in ("attn1", "attn2"):
            rules += [
                (f"{tb}.{a}.to_q", f"{fb}/{a}/to_q", "linear"),
                (f"{tb}.{a}.to_k", f"{fb}/{a}/to_k", "linear"),
                (f"{tb}.{a}.to_v", f"{fb}/{a}/to_v", "linear"),
                (f"{tb}.{a}.to_out.0", f"{fb}/{a}/to_out", "linear"),
            ]
        rules += [
            (f"{tb}.ff.net.0.proj", f"{fb}/ff/proj", "linear"),
            (f"{tb}.ff.net.2", f"{fb}/ff/out", "linear"),
            (f"{tb}.norm1", f"{fb}/norm1", "norm"),
            (f"{tb}.norm2", f"{fb}/norm2", "norm"),
            (f"{tb}.norm3", f"{fb}/norm3", "norm"),
        ]
    return rules


def diffusers_unet_rules(cfg: UNetConfig = UNetConfig(), encoder_only: bool = False):
    """Rules in apply_rules format for a diffusers UNet2DConditionModel."""
    rules = [
        ("conv_in", "input_blocks_0_conv", "conv"),
        ("time_embedding.linear_1", "time_embed/fc1", "linear"),
        ("time_embedding.linear_2", "time_embed/fc2", "linear"),
    ]
    n = cfg.num_res_blocks
    levels = len(cfg.channel_mult)
    for l in range(levels):
        for i in range(n):
            seq = 1 + l * (n + 1) + i
            rules += _res_rules(f"down_blocks.{l}.resnets.{i}", f"input_blocks_{seq}_res")
            rules += _attn_rules(
                f"down_blocks.{l}.attentions.{i}", f"input_blocks_{seq}_attn",
                cfg.transformer_depth,
            )
        if l != levels - 1:
            seq = (l + 1) * (n + 1)
            rules.append(
                (f"down_blocks.{l}.downsamplers.0.conv", f"input_blocks_{seq}_down/conv", "conv")
            )
    rules += _res_rules("mid_block.resnets.0", "middle_block_0")
    rules += _attn_rules("mid_block.attentions.0", "middle_block_1", cfg.transformer_depth)
    rules += _res_rules("mid_block.resnets.1", "middle_block_2")
    if encoder_only:
        return rules

    for l in range(levels):  # up_blocks index 0 = deepest level
        for i in range(n + 1):
            seq = l * (n + 1) + i
            rules += _res_rules(f"up_blocks.{l}.resnets.{i}", f"output_blocks_{seq}_res")
            rules += _attn_rules(
                f"up_blocks.{l}.attentions.{i}", f"output_blocks_{seq}_attn",
                cfg.transformer_depth,
            )
        if l != levels - 1:
            seq = l * (n + 1) + n
            rules.append(
                (f"up_blocks.{l}.upsamplers.0.conv", f"output_blocks_{seq}_up/conv", "conv")
            )
    rules += [("conv_norm_out", "out_norm", "norm"), ("conv_out", "out_conv", "conv")]
    return rules


def _hint_rules(tprefix: str, fprefix: str):
    """ControlNetConditioningEmbedding → HintEncoder: conv_in + blocks.0-5
    + conv_out map onto conv_0..conv_6 + conv_out."""
    rules = [(f"{tprefix}.conv_in", f"{fprefix}/conv_0", "conv")]
    for j in range(6):
        rules.append((f"{tprefix}.blocks.{j}", f"{fprefix}/conv_{j + 1}", "conv"))
    rules.append((f"{tprefix}.conv_out", f"{fprefix}/conv_out", "conv"))
    return rules


def diffusers_controlnet_rules(cfg: UNetConfig = UNetConfig()):
    rules = diffusers_unet_rules(cfg, encoder_only=True)
    rules += _hint_rules("controlnet_cond_embedding", "input_hint_block")
    rules += _hint_rules("controlnet_query_cond_embedding", "input_cond_block")
    n_taps = 1 + len(cfg.channel_mult) * cfg.num_res_blocks + (len(cfg.channel_mult) - 1)
    for i in range(n_taps):
        rules.append((f"controlnet_down_blocks.{i}", f"zero_convs_{i}", "conv"))
    rules.append(("controlnet_mid_block", "middle_block_out", "conv"))
    return rules


def diffusers_vae_rules(ch_mult=(1, 2, 4, 4), num_res_blocks=2):
    def vres(tp, fp):
        return [
            (f"{tp}.norm1", f"{fp}/norm1", "norm"),
            (f"{tp}.conv1", f"{fp}/conv1", "conv"),
            (f"{tp}.norm2", f"{fp}/norm2", "norm"),
            (f"{tp}.conv2", f"{fp}/conv2", "conv"),
            (f"{tp}.conv_shortcut", f"{fp}/nin_shortcut", "conv"),
        ]

    rules = [("quant_conv", "quant_conv", "conv"), ("post_quant_conv", "post_quant_conv", "conv")]
    for side, blocks_name in (("encoder", "down_blocks"), ("decoder", "up_blocks")):
        rules += [
            (f"{side}.conv_in", f"{side}/conv_in", "conv"),
            (f"{side}.conv_out", f"{side}/conv_out", "conv"),
            (f"{side}.conv_norm_out", f"{side}/norm_out", "norm"),
        ]
        rules += vres(f"{side}.mid_block.resnets.0", f"{side}/mid_block_1")
        rules += vres(f"{side}.mid_block.resnets.1", f"{side}/mid_block_2")
        # diffusers VAE attention is Linear-based; handled in the importer
        levels = len(ch_mult)
        for bl in range(levels):
            # decoder's up_blocks.0 = deepest level ⇒ ldm up_{levels-1-bl}
            fl = bl if side == "encoder" else levels - 1 - bl
            n = num_res_blocks if side == "encoder" else num_res_blocks + 1
            for i in range(n):
                rules += vres(f"{side}.{blocks_name}.{bl}.resnets.{i}",
                              f"{side}/{'down' if side == 'encoder' else 'up'}_{fl}_block_{i}")
            if side == "encoder" and bl != levels - 1:
                rules.append((f"encoder.down_blocks.{bl}.downsamplers.0.conv",
                              f"encoder/down_{fl}_downsample", "conv"))
            if side == "decoder" and fl != 0:
                rules.append((f"decoder.up_blocks.{bl}.upsamplers.0.conv",
                              f"decoder/up_{fl}_upsample", "conv"))
    return rules


def _vae_attention(out: dict, sd: Dict[str, np.ndarray], side: str):
    """diffusers Linear attention → our 1×1-conv VAEAttnBlock params."""
    tp = f"{side}.mid_block.attentions.0"
    if f"{tp}.to_q.weight" in sd:  # diffusers >= 0.18 Attention
        names = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "proj_out"}
    elif f"{tp}.query.weight" in sd:  # diffusers <= 0.17 AttentionBlock
        names = {"query": "q", "key": "k", "value": "v", "proj_attn": "proj_out"}
    else:
        raise KeyError(
            f"unrecognized VAE attention key scheme under '{tp}.*' — "
            "expected to_q/... (diffusers>=0.18) or query/... (<=0.17); "
            f"sample keys: {[k for k in sd if k.startswith(tp)][:4]}")
    _set(out, f"{side}/mid_attn_1/norm", "scale", sd[f"{tp}.group_norm.weight"])
    _set(out, f"{side}/mid_attn_1/norm", "bias", sd[f"{tp}.group_norm.bias"])
    for tname, fname in names.items():
        w = sd[f"{tp}.{tname}.weight"]  # (C, C) linear (possibly (C,C,1,1) conv)
        kern = w.reshape(w.shape[0], w.shape[1]).T[None, None]  # (1,1,Cin,Cout)
        _set(out, f"{side}/mid_attn_1/{fname}", "kernel", kern)
        _set(out, f"{side}/mid_attn_1/{fname}", "bias", sd[f"{tp}.{tname}.bias"])


def import_diffusers_folder(root: str, unet_cfg: UNetConfig = UNetConfig()) -> dict:
    """A prompt-diffusion-diffusers folder → pipeline params dict."""
    params = {}
    unet_sd = load_component_state(os.path.join(root, "unet"))
    params["unet"] = {"params": apply_rules(unet_sd, diffusers_unet_rules(unet_cfg))}
    cn_sd = load_component_state(os.path.join(root, "controlnet"))
    params["controlnet"] = {"params": apply_rules(cn_sd, diffusers_controlnet_rules(unet_cfg))}
    vae_sd = load_component_state(os.path.join(root, "vae"))
    vae_params = apply_rules(vae_sd, diffusers_vae_rules())
    _vae_attention(vae_params, vae_sd, "encoder")
    _vae_attention(vae_params, vae_sd, "decoder")
    params["vae"] = {"params": vae_params}
    te_dir = os.path.join(root, "text_encoder")
    if os.path.isdir(te_dir):
        te_sd = load_component_state(te_dir)
        te_sd = {f"transformer.{k}": v for k, v in te_sd.items()}
        params["clip"] = {"params": apply_rules(te_sd, clip_key_rules())}
    return params


# ---------------------------------------------------------------------------
# SD3 (MMDiT) importers
# ---------------------------------------------------------------------------

def sd3_block_rules(i: int, context_pre_only: bool):
    tb, fb = f"transformer_blocks.{i}", f"blocks_{i}"
    rules = [
        (f"{tb}.norm1.linear", f"{fb}/norm1/proj", "linear"),
        (f"{tb}.norm1_context.linear", f"{fb}/norm1_context/proj", "linear"),
        (f"{tb}.attn.to_q", f"{fb}/to_q", "linear"),
        (f"{tb}.attn.to_k", f"{fb}/to_k", "linear"),
        (f"{tb}.attn.to_v", f"{fb}/to_v", "linear"),
        (f"{tb}.attn.add_q_proj", f"{fb}/add_q_proj", "linear"),
        (f"{tb}.attn.add_k_proj", f"{fb}/add_k_proj", "linear"),
        (f"{tb}.attn.add_v_proj", f"{fb}/add_v_proj", "linear"),
        (f"{tb}.attn.to_out.0", f"{fb}/to_out", "linear"),
        (f"{tb}.ff.net.0.proj", f"{fb}/ff_in", "linear"),
        (f"{tb}.ff.net.2", f"{fb}/ff_out", "linear"),
    ]
    if not context_pre_only:
        rules += [
            (f"{tb}.attn.to_add_out", f"{fb}/to_add_out", "linear"),
            (f"{tb}.ff_context.net.0.proj", f"{fb}/ff_context_in", "linear"),
            (f"{tb}.ff_context.net.2", f"{fb}/ff_context_out", "linear"),
        ]
    return rules


def sd3_transformer_rules(num_layers: int = 24):
    rules = [
        ("pos_embed.proj", "pos_embed/proj", "conv"),
        ("time_text_embed.timestep_embedder.linear_1", "time_text_embed/timestep_fc1", "linear"),
        ("time_text_embed.timestep_embedder.linear_2", "time_text_embed/timestep_fc2", "linear"),
        ("time_text_embed.text_embedder.linear_1", "time_text_embed/text_fc1", "linear"),
        ("time_text_embed.text_embedder.linear_2", "time_text_embed/text_fc2", "linear"),
        ("context_embedder", "context_embedder", "linear"),
        ("norm_out.linear", "norm_out_proj", "linear"),
        ("proj_out", "proj_out", "linear"),
    ]
    for i in range(num_layers):
        rules += sd3_block_rules(i, context_pre_only=(i == num_layers - 1))
    return rules


def sd3_controlnet_rules(num_layers: int = 12):
    rules = [
        ("pos_embed.proj", "pos_embed/proj", "conv"),
        ("pos_embed_input.proj", "pos_embed_input", "conv"),
        ("down_proj", "down_proj", "conv"),  # lives in its own module here
        ("time_text_embed.timestep_embedder.linear_1", "time_text_embed/timestep_fc1", "linear"),
        ("time_text_embed.timestep_embedder.linear_2", "time_text_embed/timestep_fc2", "linear"),
        ("time_text_embed.text_embedder.linear_1", "time_text_embed/text_fc1", "linear"),
        ("time_text_embed.text_embedder.linear_2", "time_text_embed/text_fc2", "linear"),
        ("context_embedder", "context_embedder", "linear"),
    ]
    for i in range(num_layers):
        rules += sd3_block_rules(i, context_pre_only=False)
        rules.append((f"controlnet_blocks.{i}", f"controlnet_blocks_{i}", "linear"))
    return rules


# ---------------------------------------------------------------------------
# EXPORT to diffusers folders (save_pretrained-compatible weight files)
# ---------------------------------------------------------------------------

def _save_component(sd: Dict[str, np.ndarray], folder: str) -> None:
    os.makedirs(folder, exist_ok=True)
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(folder, "diffusion_pytorch_model.safetensors"))


def export_diffusers_controlnet(controlnet_params: dict, folder: str,
                                cfg: UNetConfig = UNetConfig()) -> None:
    """ControlNet flax params → a diffusers-format weights file the
    reference's PromptDiffusionControlNetModel.from_pretrained can consume
    (the trainer's save_pretrained hook output,
    train_promptdiffusion_sd15.py:801-827). Inverse of the import rules."""
    from prompt_diffusion_tpu.tools.torch_import import export_rules

    _save_component(
        export_rules(controlnet_params["params"], diffusers_controlnet_rules(cfg)),
        folder,
    )


def export_sd3_controlnet(params: dict, folder: str, num_layers: int = 12) -> None:
    """SD3 controlnet (+down_proj) flax params → diffusers-format weights
    for the reference SD3PromptDiffusionModel (inverse of the
    sd3_controlnet_rules import path)."""
    from prompt_diffusion_tpu.tools.torch_import import export_rules

    tree = dict(params["controlnet"]["params"])
    if "down_proj" in params:
        tree["down_proj"] = params["down_proj"]["params"]["down_proj"]
    _save_component(export_rules(tree, sd3_controlnet_rules(num_layers)), folder)


def t5_params_from_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """HF `T5EncoderModel` state dict → models.t5_text.T5Encoder params
    (reference loads T5 as text_encoder_3, train_promptdiffusion_sd3.py:
    871-906). T5 linears carry no bias; RMSNorms carry scale only; the
    relative-position bucket table lives on block 0's attention."""
    p = {
        "token_embedding": {"embedding": sd["shared.weight"]},
        "final_norm": {"scale": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(num_layers):
        e = f"encoder.block.{i}"
        blk = {
            "ln_attn": {"scale": sd[f"{e}.layer.0.layer_norm.weight"]},
            "ln_ff": {"scale": sd[f"{e}.layer.1.layer_norm.weight"]},
            "attn": {
                n: {"kernel": np.ascontiguousarray(sd[f"{e}.layer.0.SelfAttention.{n}.weight"].T)}
                for n in ("q", "k", "v", "o")
            },
            "wi_0": {"kernel": np.ascontiguousarray(sd[f"{e}.layer.1.DenseReluDense.wi_0.weight"].T)},
            "wi_1": {"kernel": np.ascontiguousarray(sd[f"{e}.layer.1.DenseReluDense.wi_1.weight"].T)},
            "wo": {"kernel": np.ascontiguousarray(sd[f"{e}.layer.1.DenseReluDense.wo.weight"].T)},
        }
        rb = sd.get(f"{e}.layer.0.SelfAttention.relative_attention_bias.weight")
        if rb is not None:
            blk["attn"]["relative_attention_bias"] = rb
        p[f"blocks_{i}"] = blk
    return p


def import_sd3_folder(root: str, num_layers: int = 24, controlnet_layers: int = 12) -> dict:
    """SD3 diffusers folder (transformer/, controlnet/, vae/, text encoders)
    → params for PromptDiffusionSD3 (promptdiffusioncontrolnet_sd3.py
    checkpoint layout)."""
    params = {}
    tdir = os.path.join(root, "transformer")
    if os.path.isdir(tdir):
        sd = load_component_state(tdir)
        params["transformer"] = {"params": apply_rules(sd, sd3_transformer_rules(num_layers))}
    cdir = os.path.join(root, "controlnet")
    if os.path.isdir(cdir):
        sd = load_component_state(cdir)
        tree = apply_rules(sd, sd3_controlnet_rules(controlnet_layers))
        down = tree.pop("down_proj", None)
        params["controlnet"] = {"params": tree}
        if down is not None:
            params["down_proj"] = {"params": {"down_proj": down}}
    vdir = os.path.join(root, "vae")
    if os.path.isdir(vdir):
        sd = load_component_state(vdir)
        tree = apply_rules(sd, diffusers_vae_rules())
        _vae_attention(tree, sd, "encoder")
        _vae_attention(tree, sd, "decoder")
        params["vae"] = {"params": tree}
    for te, name in (("text_encoder", "clip_l"), ("text_encoder_2", "clip_g")):
        d = os.path.join(root, te)
        if os.path.isdir(d):
            sd = load_component_state(d)
            sd = {f"transformer.{k}": v for k, v in sd.items()}
            nl = max(
                (int(k.split(".")[4]) for k in sd if ".encoder.layers." in k), default=11
            ) + 1
            params[name] = {"params": apply_rules(sd, clip_key_rules(nl))}
    d3 = os.path.join(root, "text_encoder_3")
    if os.path.isdir(d3):
        sd = load_component_state(d3)
        nl = max(
            (int(k.split(".")[2]) for k in sd if k.startswith("encoder.block.")),
            default=23,
        ) + 1
        params["t5"] = {"params": t5_params_from_state_dict(sd, nl)}
    return params

"""Torch/ldm checkpoint → Flax parameter import.

Replaces the reference's checkpoint tooling for the TPU stack:
  * `cldm/model.py:12-21` load_state_dict (torch .ckpt or .safetensors)
  * `tool_add_control.py:27-77` — SD ckpt → ControlNet-initialized params
    (clone `model.diffusion_model.*` into `control_model.*`)

Four reference namespaces (SURVEY.md §2.11):
  model.diffusion_model.* → unet ;  control_model.* → controlnet ;
  first_stage_model.*     → vae  ;  cond_stage_model.* → clip

Layout transforms (torch → flax/NHWC):
  conv  (O,I,kh,kw) → (kh,kw,I,O) ;  linear (O,I) → (I,O)
  norm weight/bias  → scale/bias  ;  embeddings keep their table layout

Key mapping is table-driven from the same `encoder_plan`/`decoder_plan`
the models build from, so model structure and import stay in lockstep.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np

from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig


# --------------------------------------------------------------------------
# low-level loading / tensor conversion
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pth/.bin or .safetensors file into numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# --------------------------------------------------------------------------
# key-mapping tables. Each entry: torch_prefix -> (flax_path, kind)
# kind ∈ {conv, linear, norm, raw}; expands to .weight/.bias handling.
# --------------------------------------------------------------------------

def _res_map(tprefix: str, fprefix: str):
    return [
        (f"{tprefix}.in_layers.0", f"{fprefix}/in_norm", "norm"),
        (f"{tprefix}.in_layers.2", f"{fprefix}/in_conv", "conv"),
        (f"{tprefix}.emb_layers.1", f"{fprefix}/emb_proj", "linear"),
        (f"{tprefix}.out_layers.0", f"{fprefix}/out_norm", "norm"),
        (f"{tprefix}.out_layers.3", f"{fprefix}/out_conv", "conv"),
        (f"{tprefix}.skip_connection", f"{fprefix}/skip", "conv"),
    ]


def _attn_map(tprefix: str, fprefix: str, depth: int = 1):
    rules = [
        (f"{tprefix}.norm", f"{fprefix}/norm", "norm"),
        (f"{tprefix}.proj_in", f"{fprefix}/proj_in", "conv"),
        (f"{tprefix}.proj_out", f"{fprefix}/proj_out", "conv"),
    ]
    for dd in range(depth):
        tb = f"{tprefix}.transformer_blocks.{dd}"
        fb = f"{fprefix}/block_{dd}"
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


def unet_key_rules(cfg: UNetConfig, is_controlnet: bool = False):
    """(torch_prefix, flax_path, kind) rules for the ldm UNet / ControlNet."""
    rules = [
        ("time_embed.0", "time_embed/fc1", "linear"),
        ("time_embed.2", "time_embed/fc2", "linear"),
    ]
    enc_plan, enc_chans, _, ds = cfg.encoder_plan()
    for i, (kind, out_ch, has_attn) in enumerate(enc_plan):
        if kind == "conv":
            rules.append((f"input_blocks.{i}.0", f"input_blocks_{i}_conv", "conv"))
        elif kind == "res":
            rules += _res_map(f"input_blocks.{i}.0", f"input_blocks_{i}_res")
            if has_attn:
                rules += _attn_map(
                    f"input_blocks.{i}.1", f"input_blocks_{i}_attn", cfg.transformer_depth
                )
        elif kind == "down":
            rules.append((f"input_blocks.{i}.0.op", f"input_blocks_{i}_down/conv", "conv"))

    rules += _res_map("middle_block.0", "middle_block_0")
    rules += _attn_map("middle_block.1", "middle_block_1", cfg.transformer_depth)
    rules += _res_map("middle_block.2", "middle_block_2")

    if is_controlnet:
        for i in range(len(enc_plan)):
            rules.append((f"zero_convs.{i}.0", f"zero_convs_{i}", "conv"))
        rules.append(("middle_block_out.0", "middle_block_out", "conv"))
        for blk in ("input_hint_block", "input_cond_block"):
            for j in range(7):
                rules.append((f"{blk}.{2 * j}", f"{blk}/conv_{j}", "conv"))
            rules.append((f"{blk}.14", f"{blk}/conv_out", "conv"))
    else:
        dec_plan = cfg.decoder_plan(enc_chans, ds)
        for i, (kind, out_ch, has_attn, has_up) in enumerate(dec_plan):
            rules += _res_map(f"output_blocks.{i}.0", f"output_blocks_{i}_res")
            up_idx = 1
            if has_attn:
                rules += _attn_map(
                    f"output_blocks.{i}.1", f"output_blocks_{i}_attn", cfg.transformer_depth
                )
                up_idx = 2
            if has_up:
                rules.append(
                    (f"output_blocks.{i}.{up_idx}.conv", f"output_blocks_{i}_up/conv", "conv")
                )
        rules.append(("out.0", "out_norm", "norm"))
        rules.append(("out.2", "out_conv", "conv"))
    return rules


def vae_key_rules(ch_mult: Tuple[int, ...] = (1, 2, 4, 4), num_res_blocks: int = 2):
    rules = [("quant_conv", "quant_conv", "conv"), ("post_quant_conv", "post_quant_conv", "conv")]

    def vres(tp, fp):
        return [
            (f"{tp}.norm1", f"{fp}/norm1", "norm"),
            (f"{tp}.conv1", f"{fp}/conv1", "conv"),
            (f"{tp}.norm2", f"{fp}/norm2", "norm"),
            (f"{tp}.conv2", f"{fp}/conv2", "conv"),
            (f"{tp}.nin_shortcut", f"{fp}/nin_shortcut", "conv"),
        ]

    def vattn(tp, fp):
        return [
            (f"{tp}.norm", f"{fp}/norm", "norm"),
            (f"{tp}.q", f"{fp}/q", "conv"),
            (f"{tp}.k", f"{fp}/k", "conv"),
            (f"{tp}.v", f"{fp}/v", "conv"),
            (f"{tp}.proj_out", f"{fp}/proj_out", "conv"),
        ]

    for side in ("encoder", "decoder"):
        fp = side
        rules.append((f"{side}.conv_in", f"{fp}/conv_in", "conv"))
        rules.append((f"{side}.conv_out", f"{fp}/conv_out", "conv"))
        rules.append((f"{side}.norm_out", f"{fp}/norm_out", "norm"))
        rules += vres(f"{side}.mid.block_1", f"{fp}/mid_block_1")
        rules += vattn(f"{side}.mid.attn_1", f"{fp}/mid_attn_1")
        rules += vres(f"{side}.mid.block_2", f"{fp}/mid_block_2")
    for l in range(len(ch_mult)):
        for i in range(num_res_blocks):
            rules += vres(f"encoder.down.{l}.block.{i}", f"encoder/down_{l}_block_{i}")
        if l != len(ch_mult) - 1:
            rules.append(
                (f"encoder.down.{l}.downsample.conv", f"encoder/down_{l}_downsample", "conv")
            )
        for i in range(num_res_blocks + 1):
            rules += vres(f"decoder.up.{l}.block.{i}", f"decoder/up_{l}_block_{i}")
        if l != 0:
            rules.append((f"decoder.up.{l}.upsample.conv", f"decoder/up_{l}_upsample", "conv"))
    return rules


def clip_key_rules(num_layers: int = 12):
    tm = "transformer.text_model"
    rules = [
        (f"{tm}.embeddings.token_embedding", "token_embedding", "embed"),
        (f"{tm}.final_layer_norm", "final_layer_norm", "norm_ln"),
    ]
    for i in range(num_layers):
        tp = f"{tm}.encoder.layers.{i}"
        fp = f"layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rules.append((f"{tp}.self_attn.{proj}", f"{fp}/self_attn/{proj}", "linear"))
        rules += [
            (f"{tp}.layer_norm1", f"{fp}/layer_norm1", "norm_ln"),
            (f"{tp}.layer_norm2", f"{fp}/layer_norm2", "norm_ln"),
            (f"{tp}.mlp.fc1", f"{fp}/fc1", "linear"),
            (f"{tp}.mlp.fc2", f"{fp}/fc2", "linear"),
        ]
    return rules


# --------------------------------------------------------------------------
# applying rules
# --------------------------------------------------------------------------

def _set(tree: dict, path: str, leaf_name: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def apply_rules(sd: Dict[str, np.ndarray], rules, strip_prefix: str = "") -> dict:
    """Build a flax 'params' subtree from a torch state dict + rules.
    Missing torch keys are skipped (e.g. absent skip_connections)."""
    out: dict = {}
    n = len(strip_prefix)
    sd = {k[n:]: v for k, v in sd.items() if k.startswith(strip_prefix)}
    for tprefix, fpath, kind in rules:
        w = sd.get(f"{tprefix}.weight")
        b = sd.get(f"{tprefix}.bias")
        if w is None and b is None:
            continue
        if kind == "conv":
            _set(out, fpath, "kernel", _conv(w))
            if b is not None:
                _set(out, fpath, "bias", b)
        elif kind == "linear":
            _set(out, fpath, "kernel", _linear(w))
            if b is not None:
                _set(out, fpath, "bias", b)
        elif kind in ("norm", "norm_ln"):
            _set(out, fpath, "scale", w)
            _set(out, fpath, "bias", b)
        elif kind == "embed":
            _set(out, fpath, "embedding", w)
    # CLIP position embedding is a bare param (no .weight/.bias pair handled
    # above) — map it directly when present.
    pos = sd.get("transformer.text_model.embeddings.position_embedding.weight")
    if pos is not None:
        out["position_embedding"] = pos
    return out


def import_ldm_checkpoint(
    path: str,
    unet_cfg: UNetConfig = UNetConfig(),
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
    vae_num_res_blocks: int = 2,
    clip_layers: int = 12,
) -> dict:
    """Full reference .ckpt → {"unet","controlnet","vae","clip"} param dict
    (each wrapped as {"params": ...}), ready for the SD1.5 pipeline."""
    sd = load_torch_state_dict(path)
    return {
        "unet": {"params": apply_rules(sd, unet_key_rules(unet_cfg), "model.diffusion_model.")},
        "controlnet": {
            "params": apply_rules(sd, unet_key_rules(unet_cfg, is_controlnet=True), "control_model.")
        },
        "vae": {"params": apply_rules(sd, vae_key_rules(vae_ch_mult, vae_num_res_blocks),
                                      "first_stage_model.")},
        "clip": {"params": apply_rules(sd, clip_key_rules(clip_layers), "cond_stage_model.")},
    }


# --------------------------------------------------------------------------
# EXPORT back to reference formats (the inverse of apply_rules)
# --------------------------------------------------------------------------

def _get(tree: dict, path: str):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_rules(tree: dict, rules, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax 'params' subtree → torch state-dict entries, via the SAME rule
    tables the importer uses (so import/export stay in lockstep). Inverse
    layout transforms: kernel (kh,kw,I,O) → (O,I,kh,kw); (I,O) → (O,I)."""
    sd: Dict[str, np.ndarray] = {}

    def put(key, value):
        sd[f"{prefix}{key}"] = np.asarray(value)

    for tprefix, fpath, kind in rules:
        node = _get(tree, fpath)
        if node is None:
            continue
        if kind == "conv":
            put(f"{tprefix}.weight", np.transpose(node["kernel"], (3, 2, 0, 1)))
            if "bias" in node:
                put(f"{tprefix}.bias", node["bias"])
        elif kind == "linear":
            put(f"{tprefix}.weight", np.transpose(node["kernel"], (1, 0)))
            if "bias" in node:
                put(f"{tprefix}.bias", node["bias"])
        elif kind in ("norm", "norm_ln"):
            put(f"{tprefix}.weight", node["scale"])
            put(f"{tprefix}.bias", node["bias"])
        elif kind == "embed":
            put(f"{tprefix}.weight", node["embedding"])
    # CLIP position embedding (bare param — mirrors apply_rules' special case)
    pos = tree.get("position_embedding") if isinstance(tree, dict) else None
    if pos is not None:
        put("transformer.text_model.embeddings.position_embedding.weight", pos)
    return sd


def export_ldm_checkpoint(
    params: dict,
    path: str,
    unet_cfg: UNetConfig = UNetConfig(),
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
    vae_num_res_blocks: int = 2,
    clip_layers: int = 12,
) -> None:
    """{"unet","controlnet","vae","clip"} param dict → reference .ckpt
    loadable by `cldm/model.py:12-28` (torch format, `state_dict` payload,
    the four reference namespaces of SURVEY.md §2.11). The inverse of
    `import_ldm_checkpoint` — trained ControlNets round-trip back into the
    reference ecosystem."""
    import torch

    sd: Dict[str, np.ndarray] = {}
    if "unet" in params:
        sd.update(export_rules(params["unet"]["params"], unet_key_rules(unet_cfg),
                               "model.diffusion_model."))
    if "controlnet" in params:
        sd.update(export_rules(params["controlnet"]["params"],
                               unet_key_rules(unet_cfg, is_controlnet=True),
                               "control_model."))
    if "vae" in params:
        sd.update(export_rules(params["vae"]["params"],
                               vae_key_rules(vae_ch_mult, vae_num_res_blocks),
                               "first_stage_model."))
    if "clip" in params:
        sd.update(export_rules(params["clip"]["params"], clip_key_rules(clip_layers),
                               "cond_stage_model."))
    torch.save({"state_dict": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}},
               path)


def controlnet_init_from_unet(unet_params: dict, controlnet_params: dict) -> dict:
    """tool_add_control.py equivalent: copy the UNet's shared encoder weights
    into a freshly-initialized ControlNet param tree (hint blocks and zero
    convs keep their fresh/zero init)."""
    import jax

    src = unet_params["params"]
    dst = jax.tree_util.tree_map(lambda x: x, controlnet_params)["params"]
    for key in list(dst.keys()):
        if key in src:
            dst[key] = src[key]
    return {"params": dst}


def make_it_fit(imported, template):
    """Cyclic weight resizing for shape-mismatched imports — the
    `make_it_fit` surgery of ddpm.py:209-270 (used when loading a ckpt
    into a model with widened/narrowed layers): every mismatched axis is
    filled by cycling the source values; matching leaves pass through."""
    import jax

    def fit(src, dst_leaf):
        src = np.asarray(src)
        dst_shape = dst_leaf.shape
        if src.shape == tuple(dst_shape):
            return src
        out = np.zeros(dst_shape, src.dtype)
        idx = np.indices(dst_shape).reshape(len(dst_shape), -1).T
        src_shape = np.asarray(src.shape)
        for flat in idx:
            out[tuple(flat)] = src[tuple(flat % src_shape)]
        return out

    def walk(imp, tmpl):
        if isinstance(tmpl, dict):
            return {
                k: walk(imp.get(k), v) if isinstance(imp, dict) else None
                for k, v in tmpl.items()
            }
        if imp is None:
            return None
        return fit(imp, tmpl)

    return walk(imported, template)


def validate_tree_shapes(imported: dict, reference: dict, path: str = "") -> list:
    """Compare two pytrees' leaf shapes; returns list of mismatch strings."""
    errs = []
    if isinstance(reference, dict):
        for k, v in reference.items():
            if not isinstance(imported, dict) or k not in imported:
                errs.append(f"missing {path}/{k}")
            else:
                errs += validate_tree_shapes(imported[k], v, f"{path}/{k}")
    else:
        ish = getattr(imported, "shape", None)
        rsh = getattr(reference, "shape", None)
        if ish != rsh:
            errs.append(f"shape mismatch {path}: {ish} vs {rsh}")
    return errs

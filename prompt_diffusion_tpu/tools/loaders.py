"""Pipeline-level weight loaders: LoRA, textual inversion, single-file.

TPU-native counterpart of the reference pipeline's loader mixins
(`/root/reference/pipeline_prompt_diffusion.py:145`:
`TextualInversionLoaderMixin, LoraLoaderMixin, FromSingleFileMixin`,
advertised at :155-156). The torch mixins monkey-patch nn.Modules at
runtime; under jit that would force recompiles, so here every loader is a
pure PARAM-TREE transform:

  * `load_lora_weights(params, file)` folds `scale · B @ A` into the
    Flax param tree (trace-time: the jitted program is unchanged, only
    weights move — matching diffusers' `fuse_lora` fast path).
  * `load_textual_inversion(params, tokenizer, file)` appends learned
    embedding rows to the CLIP token table and registers the placeholder
    token(s) with the tokenizer.
  * `from_single_file(path)` = the existing ldm `.ckpt` importer wired to
    pipeline construction (also exposed as
    `PromptDiffusionSD15.from_single_file`).

Supported LoRA layouts: the diffusers/peft key scheme
(`unet.<module>.lora_A.weight` / `lora_B.weight`, optional `.alpha`) and
the legacy diffusers scheme (`<module>.lora.down.weight`/`.up.weight`,
also `_lora.down/up`); `text_encoder.<module>...` pairs are folded into
the CLIP tree. The kohya `lora_unet_*` underscore flattening is
ambiguous to invert and is rejected with a clear error.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig
from prompt_diffusion_tpu.tools.torch_import import apply_rules, clip_key_rules


def _to_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else v


def _load_state_dict(path_or_sd) -> Dict[str, np.ndarray]:
    """torch .pt/.ckpt, .safetensors, or an in-memory dict → numpy dict.
    Nested dicts (A1111 textual-inversion layout) and non-tensor metadata
    ("name") are preserved."""
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    elif str(path_or_sd).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path_or_sd))
    else:
        import torch

        obj = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {
        k: ({kk: _to_np(vv) for kk, vv in v.items()} if isinstance(v, dict) else _to_np(v))
        for k, v in sd.items()
    }


# --------------------------------------------------------------------------
# LoRA
# --------------------------------------------------------------------------

_LORA_SUFFIXES = (
    (".lora_A.weight", ".lora_B.weight", "A"),  # peft
    (".lora.down.weight", ".lora.up.weight", "down"),  # legacy diffusers
    (".lora_down.weight", ".lora_up.weight", "down_us"),
)


def _collect_lora_pairs(sd: Dict[str, np.ndarray]):
    """{module_path: (down, up, alpha)} from any supported layout."""
    if any(k.startswith(("lora_unet_", "lora_te_")) for k in sd):
        raise ValueError(
            "kohya-style 'lora_unet_*' keys detected — convert to the "
            "diffusers key scheme first (underscore-flattened module paths "
            "are ambiguous to invert)"
        )
    pairs: Dict[str, list] = {}
    for k, v in sd.items():
        for down_sfx, up_sfx, _ in _LORA_SUFFIXES:
            if k.endswith(down_sfx):
                mod = k[: -len(down_sfx)]
                pairs.setdefault(mod, [None, None, None])[0] = v
                break
            if k.endswith(up_sfx):
                mod = k[: -len(up_sfx)]
                pairs.setdefault(mod, [None, None, None])[1] = v
                break
        if k.endswith(".alpha"):
            pairs.setdefault(k[: -len(".alpha")], [None, None, None])[2] = float(v)
    out = {}
    for mod, (down, up, alpha) in pairs.items():
        if down is None or up is None:
            raise ValueError(f"LoRA pair incomplete for module {mod!r}")
        out[mod] = (down, up, alpha)
    return out


def _compose_delta(down: np.ndarray, up: np.ndarray, alpha: Optional[float]) -> np.ndarray:
    """ΔW = up @ down in the TORCH weight layout of the target module
    (linear (out,in); conv (out,in,kh,kw) with a 1×1 `up`)."""
    rank = down.shape[0]
    scale = (alpha / rank) if alpha is not None else 1.0
    if down.ndim == 4:  # conv lora: down (r,in,kh,kw), up (out,r,1,1)
        up2 = up.reshape(up.shape[0], rank)
        delta = np.einsum("or,rikl->oikl", up2, down)
    else:
        delta = up @ down
    return (delta * scale).astype(np.float32)


def _tree_add(params: dict, delta: dict, scale: float):
    for k, v in delta.items():
        if isinstance(v, dict):
            _tree_add(params[k], v, scale)
        else:
            params[k] = params[k] + scale * v.astype(params[k].dtype)


def _count_leaves(tree) -> int:
    if not isinstance(tree, dict):
        return 1
    return sum(_count_leaves(v) for v in tree.values())


def load_lora_weights(
    params: dict,
    path_or_sd,
    scale: float = 1.0,
    unet_cfg: UNetConfig = UNetConfig(),
    clip_layers: int = 12,
) -> dict:
    """Fold a diffusers-format LoRA into a NEW pipeline param dict.

    params: {"unet": {"params": ...}, "clip": {"params": ...}, ...} as
    produced by the importers. Returns an updated deep-ish copy (only
    touched leaves replaced). Mirrors LoraLoaderMixin.load_lora_weights +
    fuse_lora (pipeline_prompt_diffusion.py:145,155)."""
    from prompt_diffusion_tpu.tools.diffusers_import import diffusers_unet_rules

    sd = _load_state_dict(path_or_sd)
    pairs = _collect_lora_pairs(sd)
    if not pairs:
        raise ValueError("no LoRA A/B pairs found in the state dict")

    unet_delta_sd, te_delta_sd = {}, {}
    for mod, (down, up, alpha) in pairs.items():
        delta = _compose_delta(down, up, alpha)
        if mod.startswith("unet."):
            unet_delta_sd[mod[len("unet."):] + ".weight"] = delta
        elif mod.startswith("text_encoder."):
            te_delta_sd["transformer." + mod[len("text_encoder."):] + ".weight"] = delta
        else:  # bare module path → assume unet (single-model lora files)
            unet_delta_sd[mod + ".weight"] = delta

    import copy

    out = {k: copy.copy(v) for k, v in params.items()}
    n_applied = 0
    if unet_delta_sd:
        delta_tree = apply_rules(unet_delta_sd, diffusers_unet_rules(unet_cfg))
        got = _count_leaves(delta_tree)
        if got != len(unet_delta_sd):
            missing = len(unet_delta_sd) - got
            raise ValueError(
                f"{missing} unet LoRA modules did not match any known "
                f"parameter (diffusers unet key scheme expected)"
            )
        out["unet"] = {"params": copy.deepcopy(params["unet"]["params"])}
        _tree_add(out["unet"]["params"], delta_tree, scale)
        n_applied += got
    if te_delta_sd:
        delta_tree = apply_rules(te_delta_sd, clip_key_rules(clip_layers))
        got = _count_leaves(delta_tree)
        if got != len(te_delta_sd):
            raise ValueError(
                f"{len(te_delta_sd) - got} text-encoder LoRA modules did "
                f"not match any known parameter"
            )
        out["clip"] = {"params": copy.deepcopy(params["clip"]["params"])}
        _tree_add(out["clip"]["params"], delta_tree, scale)
        n_applied += got
    return out


# --------------------------------------------------------------------------
# Textual inversion
# --------------------------------------------------------------------------

def load_textual_inversion(
    params: dict,
    tokenizer,
    path_or_sd,
    token: Optional[str] = None,
) -> Tuple[dict, str, list]:
    """Append learned token embedding(s) to the CLIP table and register
    the placeholder with the tokenizer (multi-vector embeddings expand to
    several consecutive ids, diffusers TextualInversionLoaderMixin
    semantics). Accepts the A1111 `.pt` layout ({"string_to_param":
    {"*": (n,D)}, "name": tok}), the diffusers layout ({token: (D,) or
    (n,D)}), and safetensors {"emb_params": (n,D)}.

    Returns (new_params, token, ids)."""
    data = _load_state_dict(path_or_sd)
    if "string_to_param" in data or any(k.startswith("string_to_param.") for k in data):
        emb = data.get("string_to_param.*")
        if emb is None:
            emb = data["string_to_param"]["*"]
        name = data.get("name")
        token = token or (str(name) if name is not None else None)
    elif "emb_params" in data:
        emb = data["emb_params"]
    else:
        arrays = {k: v for k, v in data.items() if hasattr(v, "shape")}
        if len(arrays) != 1:
            raise ValueError(f"ambiguous textual-inversion file: keys {sorted(data)}")
        (file_token, emb), = arrays.items()
        token = token or file_token
    if token is None:
        raise ValueError("pass token=... (file does not name its placeholder)")
    emb = np.asarray(emb, np.float32)
    if emb.ndim == 1:
        emb = emb[None]

    import copy

    out = {k: copy.copy(v) for k, v in params.items()}
    clip = copy.deepcopy(params["clip"]["params"])
    table = np.asarray(clip["token_embedding"]["embedding"])
    if emb.shape[1] != table.shape[1]:
        raise ValueError(f"embedding dim {emb.shape[1]} != CLIP dim {table.shape[1]}")
    ids = list(range(table.shape[0], table.shape[0] + emb.shape[0]))
    clip["token_embedding"]["embedding"] = np.concatenate([table, emb], axis=0)
    out["clip"] = {"params": clip}
    tokenizer.add_tokens({token: ids})
    return out, token, ids


# --------------------------------------------------------------------------
# single file
# --------------------------------------------------------------------------

def from_single_file(path: str, **import_kwargs):
    """(pipe, params) from a reference-format `.ckpt`/`.safetensors`
    (FromSingleFileMixin counterpart — cldm/model.py loader semantics via
    tools/torch_import.import_ldm_checkpoint)."""
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.tools.torch_import import import_ldm_checkpoint

    params = import_ldm_checkpoint(path, **import_kwargs)
    return PromptDiffusionSD15.create(), params

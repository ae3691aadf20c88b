"""Config system: YAML → model/pipeline construction.

Replaces the reference's three config layers (SURVEY.md §5 — argparse per
driver, OmegaConf `target:`+`params:` reflection via
`instantiate_from_config` ldm/util.py:72-87, import-time globals
config.py/share.py) with ONE explicit mapping: `create_model(path)` reads
a reference-format YAML (e.g. models/cldm_v15.yaml) and builds the
equivalent TPU pipeline; dataclass configs remain the native API.

Reference `target` names are translated — e.g. `cldm.cldm.ControlLDM` →
PromptDiffusionSD15 — so existing configs keep working unmodified.
"""

from __future__ import annotations

from typing import Any, Optional


def _minimal_yaml(text: str):
    """Parse the subset of YAML the reference configs use (nested maps,
    lists, scalars) without an external dependency."""
    try:
        import yaml  # pyyaml ships with many images

        return yaml.safe_load(text)
    except ImportError:
        pass
    # fallback: indentation-based parser for map/list/scalars
    root: dict = {}
    stack = [(-1, root)]
    lines = [l for l in text.splitlines() if l.strip() and not l.strip().startswith("#")]
    i = 0
    while i < len(lines):
        raw = lines[i]
        indent = len(raw) - len(raw.lstrip())
        line = raw.strip()
        while stack and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1]
        if line.startswith("- "):
            val = _scalar(line[2:])
            if isinstance(parent, list):
                parent.append(val)
            i += 1
            continue
        key, _, rest = line.partition(":")
        key = key.strip()
        rest = rest.strip()
        if rest:
            parent[key] = _scalar(rest)
        else:
            # look ahead: list or map
            child: Any
            if i + 1 < len(lines) and lines[i + 1].strip().startswith("- "):
                child = []
            else:
                child = {}
            parent[key] = child
            stack.append((indent, child))
        i += 1
    return root


def _scalar(s: str):
    s = s.split(" #")[0].strip().strip('"').strip("'")
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        return [_scalar(x) for x in inner.split(",")] if inner else []
    return s


def load_yaml(path: str):
    with open(path) as f:
        return _minimal_yaml(f.read())


def create_model(config_path: str, policy=None):
    """Reference-format model YAML → PromptDiffusionSD15
    (cldm/model.py:24-28 `create_model` equivalent)."""
    from prompt_diffusion_tpu.models.clip_text import CLIPTextModel
    from prompt_diffusion_tpu.models.controlnet_sd15 import ControlNetSD15
    from prompt_diffusion_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from prompt_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from prompt_diffusion_tpu.pipelines.prompt_diffusion_sd15 import PromptDiffusionSD15
    from prompt_diffusion_tpu.schedulers.schedules import DiffusionSchedule
    from prompt_diffusion_tpu.utils.dtypes import default_policy

    policy = policy or default_policy()
    cfg = load_yaml(config_path)
    m = cfg["model"]["params"]

    def unet_cfg(section) -> UNetConfig:
        p = section["params"]
        return UNetConfig(
            in_channels=p.get("in_channels", 4),
            out_channels=p.get("out_channels", p.get("in_channels", 4)),
            model_channels=p.get("model_channels", 320),
            num_res_blocks=p.get("num_res_blocks", 2),
            attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
            channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
            num_heads=p.get("num_heads", 8),
            transformer_depth=p.get("transformer_depth", 1),
            context_dim=p.get("context_dim", 768),
            use_checkpoint=bool(p.get("use_checkpoint", False)),
        )

    dd = m["first_stage_config"]["params"]["ddconfig"]
    vae_cfg = VAEConfig(
        in_channels=dd.get("in_channels", 3),
        out_channels=dd.get("out_ch", 3),
        z_channels=dd.get("z_channels", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        double_z=bool(dd.get("double_z", True)),
        scale_factor=m.get("scale_factor", 0.18215),
    )
    schedule = DiffusionSchedule.create(
        schedule="linear",
        timesteps=m.get("timesteps", 1000),
        linear_start=m.get("linear_start", 0.00085),
        linear_end=m.get("linear_end", 0.0120),
    )
    control_params = m["control_stage_config"]["params"]
    return PromptDiffusionSD15(
        unet=UNetSD15(config=unet_cfg(m["unet_config"]), policy=policy),
        controlnet=ControlNetSD15(
            config=unet_cfg(m["control_stage_config"]),
            hint_channels=control_params.get("hint_channels", 6),
            policy=policy,
        ),
        vae=AutoencoderKL(config=vae_cfg, policy=policy),
        text_encoder=CLIPTextModel(policy=policy),
        schedule=schedule,
    )

"""Training-time image logging.

Replaces `cldm/logger.py:11-88` (ImageLogger callback) and the diffusers
trainers' `log_generated_images`/`log_validation`: every `freq` steps run
the jitted sampler on a fixed validation batch and write a PNG grid +
prompt sidecar under `<logdir>/image_log/<split>/`.

Process-0 only (the rank_zero_only of the reference becomes a
`jax.process_index() == 0` check)."""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax


def _to_uint8(img01: np.ndarray) -> np.ndarray:
    return (np.clip(img01, 0, 1) * 255).astype(np.uint8)


def save_grid(images01: np.ndarray, path: str, ncol: Optional[int] = None):
    """images01: (N,H,W,3) in [0,1] → single PNG grid."""
    from PIL import Image

    n, h, w, c = images01.shape
    ncol = ncol or min(4, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.zeros((nrow * h, ncol * w, c), np.uint8)
    for i in range(n):
        r, cc = divmod(i, ncol)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = _to_uint8(images01[i])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(grid).save(path)


class ImageLogger:
    def __init__(self, logdir: str, freq: int = 500, max_images: int = 4,
                 guidance_scale: float = 9.0, num_steps: int = 50):
        self.dir = os.path.join(logdir, "image_log")
        self.freq = freq
        self.max_images = max_images
        self.guidance_scale = guidance_scale
        self.num_steps = num_steps
        self._gen = None  # jitted sampler, built ONCE on first log

    def maybe_log(self, pipe, params, batch, step: int, rng, split: str = "train"):
        if step == 0 or step % self.freq or jax.process_index() != 0:
            return
        n = min(self.max_images, batch["image"].shape[0])
        import jax.numpy as jnp

        if self._gen is None:
            # a fresh pipe.jit_generate() per log event would start from an
            # empty jit cache and recompile the full sampler (minutes at
            # 512² on TPU) every --image-log-every steps
            self._gen = pipe.jit_generate()
        gen = self._gen
        imgs = gen(
            params, rng,
            jnp.asarray(batch["token_ids"][:n]),
            jnp.asarray(np.repeat(batch["null_ids"], n, axis=0)),
            jnp.asarray(batch["example_pair"][:n]),
            jnp.asarray(batch["query"][:n]),
            num_steps=self.num_steps,
            guidance_scale=self.guidance_scale,
        )
        out = os.path.join(self.dir, split)
        save_grid(np.asarray(imgs), os.path.join(out, f"samples_step{step:06d}.png"))
        save_grid((np.asarray(batch["query"][:n]) + 0.0), os.path.join(out, f"query_step{step:06d}.png"))
        with open(os.path.join(out, f"prompts_step{step:06d}.json"), "w") as f:
            json.dump(batch["prompt"][:n], f)


class MetricLogger:
    """JSONL + stdout scalar logging (TensorBoard/W&B double-logging of
    train.py:251-257 collapses to one append-only stream; point external
    dashboards at the file)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")

    def log(self, step: int, metrics: dict):
        if jax.process_index() != 0:
            return
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

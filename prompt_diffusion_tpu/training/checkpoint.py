"""Checkpoint save/restore (orbax).

Replaces the reference's four checkpoint mechanisms (SURVEY.md §5):
PL ModelCheckpoint every-1000-steps (train.py:224-235), Accelerate
save_state with rotation (train_promptdiffusion_sd15.py:1129-1152),
torch/safetensors loaders (cldm/model.py:12-21), and ckpt surgery
(tool_add_control.py → tools/torch_import.controlnet_init_from_unet).

One orbax CheckpointManager handles: step-numbered directories, keep-N
rotation, async save, and sharded arrays (restores respect the current
mesh sharding — multi-host safe, unlike torch.save)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def make_manager(
    directory: str,
    save_every: int = 1000,
    keep: Optional[int] = None,
) -> ocp.CheckpointManager:
    """keep=None keeps all (PL save_top_k=-1 semantics, train.py:231)."""
    options = ocp.CheckpointManagerOptions(
        save_interval_steps=save_every,
        max_to_keep=keep,
        create=True,
        enable_async_checkpointing=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_state(manager: ocp.CheckpointManager, step: int, state: Any, force: bool = False):
    manager.save(step, args=ocp.args.StandardSave(state), force=force)


def restore_state(manager: ocp.CheckpointManager, template: Any, step: Optional[int] = None):
    """Restore into the template's structure/shardings. step=None → latest.
    Returns (state, restored_step) or (template, None) when no ckpt."""
    step = step if step is not None else manager.latest_step()
    if step is None:
        return template, None
    restored = manager.restore(step, args=ocp.args.StandardRestore(template))
    return restored, step


def save_final(manager: ocp.CheckpointManager, step: int, state: Any):
    """End-of-run force save: the last training step is usually NOT on a
    save_interval multiple, so without this the final partial interval of
    updates is silently discarded at exit. No-op when `step` already
    saved (interval landed exactly on it)."""
    manager.wait_until_finished()
    if manager.latest_step() != step:
        manager.save(step, args=ocp.args.StandardSave(state), force=True)
    manager.wait_until_finished()


def wait_for_saves(manager: ocp.CheckpointManager):
    manager.wait_until_finished()

#!/usr/bin/env bash
# SD1.5 Prompt-Diffusion training launch (reference: scripts/train_v1-5.sh).
#
# The reference's two-step flow — clone SD weights into the ControlNet
# (tool_add_control.py) then train with PL-DDP — collapses here into one
# driver: --init-ckpt imports the SD checkpoint AND applies the
# controlnet-from-unet clone (tools/torch_import.controlnet_init_from_unet),
# and the 'data'×'fsdp' mesh replaces --gpus/--num_nodes.
#
# usage: scripts/train_sd15.sh <name> <path/to/v1-5-pruned-emaonly.ckpt> <data_root>
set -euo pipefail
name=${1:?experiment name}
ckpt=${2:?stable diffusion checkpoint}
data=${3:?laion data root}

python train_sd15.py \
  --data-root "${data}" \
  --logdir "runs/${name}" \
  --init-ckpt "${ckpt}" \
  --batch-size 64 --accum-steps 4 --lr 1e-4 --max-steps 10000 \
  --sd-locked \
  --ckpt-every 1000 --image-log-every 500

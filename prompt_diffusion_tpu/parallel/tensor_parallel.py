"""Tensor-parallel sharding rules for the SD3 MMDiT.

Extends the (data, fsdp) mesh with a `tensor` axis (Megatron-style TP,
GSPMD-native): attention head projections column-shard their output dim
and row-shard the return projection; the FF expands column-sharded and
contracts row-sharded. XLA then keeps the activations head/hidden-sharded
through the block and inserts exactly one all-reduce per residual add —
no hand-written collective anywhere; the model code is untouched.

The reference has no TP at all (SURVEY §2.10 — NCCL DDP only); this is a
capability superset enabling >1-chip serving of models whose activations
or KV don't fit one chip at batch.

Usage:
    mesh = make_tp_mesh(num_data=2, num_tensor=4)
    sharded = apply_tp_sharding(params, mesh)     # transformer/controlnet
    out = jit(pipe.apply...)(sharded, batch_sharded_inputs)

Sharding layout per JointBlock (hidden C, heads H, head_dim D):
    to_q/to_k/to_v/add_*_proj kernel  (C, H·D)   → P(None, 'tensor')
    to_out/to_add_out kernel          (H·D, C)   → P('tensor', None)
    ff_in/ff_context_in kernel        (C, 4C)    → P(None, 'tensor')
    ff_out/ff_context_out kernel      (4C, C)    → P('tensor', None)
    AdaLN `proj`, embedders, biases, norms       → replicated
The head axis (H·D) divides by num_tensor when H % num_tensor == 0 —
SD3-Medium's 24 heads shard over 2/4/8-way tensor groups.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


TP_AXIS = "tensor"

# kernel-name → (partition spec for the 2D kernel)
_COL = P(None, TP_AXIS)  # output-dim sharded
_ROW = P(TP_AXIS, None)  # input-dim sharded (produces partial sums → psum)

_TP_KERNEL_RULES = {
    "to_q": _COL,
    "to_k": _COL,
    "to_v": _COL,
    "add_q_proj": _COL,
    "add_k_proj": _COL,
    "add_v_proj": _COL,
    "to_out": _ROW,
    "to_add_out": _ROW,
    "ff_in": _COL,
    "ff_out": _ROW,
    "ff_context_in": _COL,
    "ff_context_out": _ROW,
}


def make_tp_mesh(
    num_data: int = 1,
    num_tensor: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'tensor') mesh; tensor axis defaults to the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_tensor is None:
        num_tensor = n // num_data
    assert num_data * num_tensor == n, f"{num_data}x{num_tensor} != {n}"
    arr = np.asarray(devices).reshape(num_data, num_tensor)
    return Mesh(arr, ("data", TP_AXIS))


def _spec_for(path, leaf, num_tensor: int) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    leaf_name = names[-1] if names else ""
    module = names[-2] if len(names) >= 2 else ""
    if leaf_name == "kernel" and module in _TP_KERNEL_RULES and leaf.ndim == 2:
        spec = _TP_KERNEL_RULES[module]
        dim = 1 if spec == _COL else 0
        if leaf.shape[dim] % num_tensor == 0:
            return spec
    if leaf_name == "bias" and module in _TP_KERNEL_RULES and leaf.ndim == 1:
        # biases of column-sharded kernels shard with the output dim;
        # row-sharded kernels' biases are added AFTER the psum → replicate
        if _TP_KERNEL_RULES[module] == _COL and leaf.shape[0] % num_tensor == 0:
            return P(TP_AXIS)
    return P()


def tp_shardings(params, mesh: Mesh):
    """NamedSharding tree for an MMDiT transformer/controlnet param tree
    ({'params': ...} as stored in the pipeline dict)."""
    num_tensor = mesh.shape[TP_AXIS]

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, num_tensor)),
        params,
    )


def apply_tp_sharding(params, mesh: Mesh):
    """Device-put an MMDiT param tree onto its TP shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh)
    )

"""Device mesh + sharding rules.

TPU-native replacement for the reference's three NCCL wrappers (PL-DDP
`train.py:260`, Accelerate DDP `train_promptdiffusion_sd3.py:825-833`, raw
torch.distributed `eval/distributed.py:13-27`): ONE `jax.sharding.Mesh`
with axes

    ('data', 'fsdp')

Batches shard over `data` × `fsdp` (both act as data-parallel axes for the
batch); parameters/optimizer state shard over `fsdp` (ZeRO-3 style) when an
axis is divisible, else replicate. Gradient all-reduce, FSDP all-gather and
reduce-scatter are all inserted by GSPMD from these annotations — there is
no hand-written collective in the training path; they ride ICI
automatically on a real slice.

Multi-host: call `jax.distributed.initialize()` once per host before
`make_mesh` (the JAX equivalent of the reference's env-var NCCL bootstrap).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    fsdp: str = "fsdp"


AXES = MeshAxes()


def make_mesh(
    num_data: Optional[int] = None,
    num_fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2D (data, fsdp) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // num_fsdp
    assert num_data * num_fsdp == n, f"{num_data}x{num_fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(num_data, num_fsdp)
    return Mesh(arr, (AXES.data, AXES.fsdp))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over BOTH mesh axes (pure DP batch)."""
    return NamedSharding(mesh, P((AXES.data, AXES.fsdp)))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: tuple, fsdp_size: int, min_size: int) -> P:
    """Shard the largest divisible axis over fsdp; else replicate."""
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = AXES.fsdp
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh, min_size: int = 2**16):
    """NamedSharding tree for a parameter pytree: ZeRO-style sharding over
    the fsdp axis (replicated over data). Small tensors stay replicated."""
    fsdp_size = mesh.shape[AXES.fsdp]

    def spec_for(x):
        return NamedSharding(mesh, _fsdp_spec(x.shape, fsdp_size, min_size))

    return jax.tree_util.tree_map(spec_for, params)


def apply_sharding(tree, shardings):
    """Device-put a pytree onto its shardings."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def make_param_gather(mesh: Optional[Mesh]):
    """gather(tree): constrain every leaf to replicated — use at train-step
    entry on fsdp-sharded params (ZeRO style: sharded at rest, all-gathered
    for compute). The constraint's VJP is a reduce-scatter, so grads come
    out fsdp-sharded to match the optimizer state; batch-sharded activations
    then never meet fsdp-sharded weights inside the model, which otherwise
    triggers XLA's involuntary-full-rematerialization resharding."""
    if mesh is None:
        return lambda tree: tree
    rep = NamedSharding(mesh, P())
    return lambda tree: jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, rep), tree
    )

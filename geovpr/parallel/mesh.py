"""Device mesh and sharding setup.

The reference is strictly single-device (`.cuda()` everywhere, zero
collectives — see SURVEY.md §2.2). The TPU-native replacement is a
`jax.sharding.Mesh` over ICI with a `data` axis for batch parallelism and an
optional `model` axis for tensor-parallel sharding of the larger backbones.
Gradient all-reduce, descriptor all-gather, and retrieval reduce happen via
XLA collectives induced by the shardings — there is no hand-written NCCL/MPI
analog to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Defaults to a 1-D data-parallel mesh over all devices. For DP x TP pass
    e.g. ``mesh_shape=(4, 2), axis_names=("data", "model")``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    if int(np.prod(mesh_shape)) != len(devices):
        raise ValueError(
            f"mesh_shape {tuple(mesh_shape)} does not cover {len(devices)} devices")
    if len(mesh_shape) != len(axis_names):
        raise ValueError("mesh_shape and axis_names must have the same rank")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over `axis`, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis))
    return jax.tree_util.tree_map(_put, batch)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad dim 0 of every leaf to a multiple (static shapes for jit), returning
    (padded_batch, valid_mask). Padded rows repeat row 0 so downstream compute
    stays finite; the mask excludes them from losses/metrics."""
    import numpy as np  # host-side only

    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    padded_n = -(-n // multiple) * multiple
    pad = padded_n - n

    def _pad(x):
        if pad == 0:
            return x
        fill = np.repeat(np.asarray(x[:1]), pad, axis=0)
        return np.concatenate([np.asarray(x), fill], axis=0)

    mask = np.arange(padded_n) < n
    return jax.tree_util.tree_map(_pad, batch), mask

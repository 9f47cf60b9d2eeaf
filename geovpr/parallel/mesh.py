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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> None:
    """Opt-in multi-host bring-up: `jax.distributed.initialize`.

    Call ONCE per process before any other jax use. On TPU pods every
    argument auto-detects from the runtime environment (plain
    ``initialize_distributed()``); elsewhere pass the coordinator address,
    process count, and this process's id. After this, `jax.devices()` spans
    the whole fleet and `create_hybrid_mesh` can lay a DCN axis across
    hosts. (The reference has no distributed backend at all — SURVEY.md
    §2.2; this is the TPU-native replacement's multi-host entry.)
    """
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def create_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Hierarchical DCN x ICI mesh for multi-host fleets.

    `ici_shape` and `dcn_shape` are per-axis factors of the same rank; axis i
    spans ici_shape[i] * dcn_shape[i] devices. Axes with dcn_shape > 1 cross
    host boundaries (slow DCN links) — lay shardings so the heavy
    collectives (TP all-reduce, gradient psum over the per-host data axis)
    ride ICI-only axes, and only cheap/infrequent traffic (cross-host grad
    psum once per step) uses the DCN axis. Example, 4 hosts x 8 chips with
    2-way TP:

        mesh = create_hybrid_mesh((4, 2), (4, 1), ("data", "model"))

    Device order comes from `jax.experimental.mesh_utils.
    create_hybrid_device_mesh` (contiguous ICI blocks per host). On fleets
    without a multi-process/multi-slice topology — e.g. the virtual CPU mesh
    tests run on — it falls back to a contiguous reshape with the same axis
    semantics, so multi-host sharding layouts stay testable single-process.
    """
    ici_shape = tuple(ici_shape)
    dcn_shape = tuple(dcn_shape)
    if len(ici_shape) != len(dcn_shape) or len(ici_shape) != len(axis_names):
        raise ValueError("ici_shape, dcn_shape, and axis_names must have "
                         "the same rank")
    devices = list(devices if devices is not None else jax.devices())
    total = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
    if int(np.prod(total)) != len(devices):
        raise ValueError(f"hybrid mesh {total} (ici {ici_shape} x dcn "
                         f"{dcn_shape}) does not cover {len(devices)} devices")
    if jax.process_count() == 1 and len(
            {getattr(d, "slice_index", 0) or 0 for d in devices}) <= 1:
        # single-process, single-slice fleet (the virtual CPU mesh tests run
        # on): no real DCN topology exists — a contiguous reshape preserves
        # the axis semantics for compilation and tests. Real multi-host
        # fleets fall through so a layout/topology mismatch SURFACES as the
        # create_hybrid_device_mesh error instead of silently landing TP
        # collectives on DCN links.
        dev_array = np.asarray(devices).reshape(total)
    else:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices)
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

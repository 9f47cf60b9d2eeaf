"""Parameter sharding rules (tensor parallelism).

The reference has no parallelism of any kind (SURVEY.md §2.2). Here TP is
expressed the JAX way: Megatron-style NamedShardings on the parameter tree,
with XLA GSPMD inserting the collectives —

- column-parallel: MLP fc1 / attention q,k,v kernels sharded on the OUTPUT
  dim over the `model` axis (each device holds a slice of heads / hidden
  units; no comm needed going in),
- row-parallel: MLP fc2 / attention proj kernels sharded on the INPUT dim
  (a psum over `model` reassembles the residual — inserted by XLA),
- everything else (embeddings, norms, biases, heads) replicated.

Batch parallelism is orthogonal: inputs sharded on dim 0 over `data`
(`geovpr.parallel.mesh.batch_sharding`); with params replicated over `data`,
jit turns the gradient sum into a psum over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("fc1", "query", "key", "value", "expand",
                   "feat_fc1", "score_fc1", "token_fc1", "hidden0")
ROW_PARALLEL = ("fc2", "proj", "feat_fc2", "score_fc2",
                "token_fc2")


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", p)) for p in path]


def param_spec(path, leaf, model_axis: str = "model") -> P:
    names = _path_names(path)
    if names and names[-1] == "kernel" and leaf.ndim >= 2:
        parent = names[-2] if len(names) >= 2 else ""
        if parent in COLUMN_PARALLEL:
            return P(*([None] * (leaf.ndim - 1)), model_axis)
        if parent in ROW_PARALLEL:
            return P(*([None] * (leaf.ndim - 2)), model_axis, None)
    return P()


def _guarded_spec(path, leaf, mesh: Mesh, model_axis: str) -> P:
    """param_spec with a divisibility guard: anything that doesn't split
    evenly over the model axis replicates. Single source of truth for both
    params and optimizer-moment sharding."""
    spec = param_spec(path, leaf, model_axis)
    axis_size = mesh.shape[model_axis]
    for dim, name in zip(leaf.shape, spec):
        if name == model_axis and dim % axis_size != 0:
            return P()
    return spec


def shard_params(mesh: Mesh, params: Any, model_axis: str = "model") -> Any:
    """device_put a parameter tree with TP shardings over `model_axis`.
    Dims not divisible by the axis size fall back to replication."""

    def _put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, _guarded_spec(path, leaf, mesh,
                                                    model_axis)))

    return jax.tree_util.tree_map_with_path(_put, params)


def shard_state(mesh: Mesh, state, model_axis: str = "model"):
    """Shard a TrainState: params + optimizer moment trees via TP rules,
    everything else replicated.

    Optimizer moments are sharded by applying `param_spec` to EVERY array
    leaf of opt_state by its key path: optax moment trees keep the param
    path as a suffix (…/mu/backbone/block0/mlp/fc1/kernel), so the same
    name-based rules apply. A treedef-equality match against the params
    tree would silently miss `optax.multi_transform`/`masked` states, whose
    MaskedNode placeholders change the tree structure — replicating every
    moment in exactly the differential-LR and frozen-warmup recipes."""
    params = shard_params(mesh, state.params, model_axis)
    rep = NamedSharding(mesh, P())

    def _put_rep(x):
        return jax.device_put(x, rep) if hasattr(x, "shape") else x

    def _put_opt(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, _guarded_spec(path, leaf, mesh,
                                                    model_axis)))

    opt_state = jax.tree_util.tree_map_with_path(_put_opt, state.opt_state)

    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=jax.tree_util.tree_map(_put_rep, state.batch_stats),
        scaler=jax.tree_util.tree_map(_put_rep, state.scaler),
        step=_put_rep(state.step), rng=_put_rep(state.rng))

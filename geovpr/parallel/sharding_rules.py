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

COLUMN_PARALLEL = ("fc1", "query", "key", "value", "expand", "pwconv1",
                   "feat_fc1", "score_fc1", "token_fc1", "hidden0")
ROW_PARALLEL = ("fc2", "proj", "pwconv2", "feat_fc2", "score_fc2",
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


def shard_params(mesh: Mesh, params: Any, model_axis: str = "model") -> Any:
    """device_put a parameter tree with TP shardings over `model_axis`.
    Dims not divisible by the axis size fall back to replication."""
    axis_size = mesh.shape[model_axis]

    def _put(path, leaf):
        spec = param_spec(path, leaf, model_axis)
        # divisibility guard: replicate anything that doesn't split evenly
        for dim, name in zip(leaf.shape, spec):
            if name == model_axis and dim % axis_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_put, params)


def shard_state(mesh: Mesh, state, model_axis: str = "model"):
    """Shard a TrainState: params + optimizer moment trees via TP rules,
    everything else replicated.

    Optax moment trees (Adam mu/nu, decayed-weights masks, ...) mirror the
    params tree exactly, so any subtree of opt_state whose treedef equals
    the params treedef gets the params shardings; remaining array leaves
    (counts, lr_scale) are replicated."""
    params = shard_params(mesh, state.params, model_axis)
    sharding_tree = jax.tree_util.tree_map(lambda p: p.sharding, params)
    params_treedef = jax.tree_util.tree_structure(state.params)
    rep = NamedSharding(mesh, P())

    def _put_rep(x):
        return jax.device_put(x, rep) if hasattr(x, "shape") else x

    def walk(node):
        if jax.tree_util.tree_structure(node) == params_treedef:
            return jax.tree_util.tree_map(jax.device_put, node, sharding_tree)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            mapped = [walk(v) for v in node]
            if hasattr(node, "_fields"):  # namedtuple (optax states)
                return type(node)(*mapped)
            return type(node)(mapped)
        return _put_rep(node)

    return state.replace(
        params=params,
        opt_state=walk(state.opt_state),
        batch_stats=jax.tree_util.tree_map(_put_rep, state.batch_stats),
        scaler=jax.tree_util.tree_map(_put_rep, state.scaler),
        step=_put_rep(state.step), rng=_put_rep(state.rng))

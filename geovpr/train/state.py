"""Train state: one pytree carrying everything a step needs.

Unlike the reference — which scatters state across the model object, the
optimizer object, a pickled sklearn scaler (`swin_attempt_2.py:139`), and a
checkpoint dict rebuilt by hand (`swin_attempt_2.py:239-247`) — the whole
training state here is a single donated pytree: params, optimizer state,
batch-norm stats, the target-scaler statistics (as arrays, so the inverse
transform runs on device and checkpoints atomically with the weights), the
step counter, and the PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from geovpr.objectives.scaler import ScalerState, identity_scaler


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    scaler: ScalerState
    rng: jax.Array

    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jax.Array,
    scaler: Optional[ScalerState] = None,
    out_dim: int = 2,
    pretrained_variables: Optional[dict] = None,
) -> TrainState:
    if pretrained_variables is not None:
        variables = model.init(rng, sample_input)
        params = _merge_pretrained(variables["params"],
                                   pretrained_variables.get("params", {}))
        batch_stats = _merge_pretrained(
            variables.get("batch_stats", {}),
            pretrained_variables.get("batch_stats", {}))
    else:
        variables = model.init(rng, sample_input)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        scaler=scaler if scaler is not None else identity_scaler(out_dim),
        rng=rng,
        apply_fn=model.apply,
        tx=tx,
    )


def _merge_pretrained(init_tree: dict, pretrained: dict,
                      path: str = "") -> dict:
    """Overlay pretrained leaves onto an init tree (backbone pretrained,
    head fresh — the reference's universal pattern). Every pretrained key
    must exist in the init tree with a matching shape — silently inserting
    unknown keys would leave the real parameters randomly initialized
    while flax ignores the orphans."""
    if not pretrained:
        return init_tree
    out = dict(init_tree)
    for k, v in pretrained.items():
        where = f"{path}/{k}" if path else k
        if k not in out:
            raise ValueError(
                f"pretrained key {where!r} not in the model's parameter "
                f"tree (have: {sorted(out)}); converted with the wrong "
                f"converter or for a different family/variant?")
        if isinstance(v, dict) != isinstance(out[k], dict):
            raise ValueError(
                f"pretrained structure mismatch at {where!r}: "
                f"{'subtree' if isinstance(v, dict) else 'leaf'} vs model "
                f"{'subtree' if isinstance(out[k], dict) else 'leaf'}")
        if isinstance(v, dict):
            out[k] = _merge_pretrained(out[k], v, where)
        else:
            if tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"pretrained shape mismatch at {where!r}: "
                    f"{tuple(v.shape)} vs {tuple(out[k].shape)}")
            out[k] = jnp.asarray(v)
    return out

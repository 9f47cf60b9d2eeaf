"""jitted train/eval steps.

Design (contrast with the reference's eager loops, swin_attempt_2.py:168-263):

- ONE compiled step per workload; all epoch/early-stop/plateau logic stays on
  the host around it (dynamic control flow never enters jit),
- the state pytree is donated — parameters update in place in HBM,
- batches arrive sharded over the mesh `data` axis; gradients are averaged
  across devices by jit itself (params replicated -> psum inserted by XLA),
- NaN-skip (`swin_angle_finetuning_sin_cos.py:110-112`) is a `jnp.where` on
  the all-finite flag: the update is computed unconditionally and discarded
  if non-finite — branchless, so the compiled step stays static,
- eval accumulates metric *sums* on device; the host only sees a handful of
  scalars per epoch (the reference copies every batch of predictions to the
  CPU, swin_attempt_2.py:202-203).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from geovpr.train.state import TrainState


def make_train_step(objective, normalize_fn=None, augment_fn=None,
                    skip_nonfinite: bool = True,
                    has_batch_stats: bool = False,
                    apply_fn=None) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {"image": (B,H,W,3) uint8 or float,
            "target": (B, T) raw targets (lat/lon or degrees),
            "mask": (B,) bool valid-row mask}
    normalize_fn: device-side uint8->normalized-float transform
    augment_fn: (rng, images) -> (images, flip_mask); flip-remapped targets
                flow through objective.remap_flip so image and label always
                agree (fixes the reference's re-sampled-flip approximation,
                swin_angle_finetuning_gemini.py:59-76)
    apply_fn: overrides state.apply_fn (the frozen-feature cache trains the
              head alone on precomputed features via
              RegressionModel.head_only)
    """

    def train_step(state: TrainState, batch):
        rng, aug_rng, new_rng = jax.random.split(state.rng, 3)
        images = batch["image"]
        targets = batch["target"]
        if augment_fn is not None:
            # augment on [0,1] RAW pixels, BEFORE normalization — the
            # reference jitters PIL images then normalizes
            # (swin_finetuning_2.py:78-82); jitter on normalized values
            # would turn brightness into contrast and rotate-padding into
            # ImageNet-mean gray. Clamp like torchvision's functional ops.
            x01 = (images.astype(jnp.float32) / 255.0
                   if images.dtype == jnp.uint8 else images)
            x01, flip = augment_fn(aug_rng, x01)
            images = jnp.clip(x01, 0.0, 1.0)
            targets = objective.remap_flip(targets, flip)
        if normalize_fn is not None:
            images = normalize_fn(images)
        batch = dict(batch, image=images, target=targets)
        enc_targets = objective.encode_targets(batch["target"], state.scaler)
        mask = batch.get("mask")

        fwd = apply_fn or state.apply_fn

        def loss_fn(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                preds, mutated = fwd(
                    variables, batch["image"], train=True, deterministic=False,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                new_stats = mutated["batch_stats"]
            else:
                preds = fwd(
                    variables, batch["image"], train=True, deterministic=False,
                    rngs={"dropout": rng})
                new_stats = state.batch_stats
            return objective.loss(preds, enc_targets, mask), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        new_state = state.apply_gradients(grads)
        new_state = new_state.replace(batch_stats=new_stats, rng=new_rng)

        if skip_nonfinite:
            grads_finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in
                 jax.tree_util.tree_leaves(grads)] + [jnp.isfinite(loss)]))
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(grads_finite, new, old)
                if hasattr(new, "dtype") and jnp.issubdtype(new.dtype, jnp.floating)
                else new,
                new_state, state.replace(rng=new_rng, step=state.step + 1))
            # report 0 for a skipped step's loss: the raw NaN would poison
            # the host's epoch mean even though the update was discarded
            metrics = {"loss": jnp.where(grads_finite, loss, 0.0),
                       "skipped": (~grads_finite).astype(jnp.float32)}
        else:
            metrics = {"loss": loss, "skipped": jnp.zeros((), jnp.float32)}
        return new_state, metrics

    return train_step


def make_eval_step(objective, normalize_fn=None,
                   has_batch_stats: bool = False,
                   apply_fn=None) -> Callable:
    """Returns eval_step(state, batch, extra_vars) -> per-batch metric sums
    + counts.

    Emits SUMS (not means) plus the valid count so the host can aggregate
    exactly over a full epoch regardless of ragged final batches.

    `apply_fn` overrides state.apply_fn (the int8 serving path swaps in a
    quantized model clone); `extra_vars` merges extra collections (e.g. the
    derived "quant" collection) into the variables — an ARGUMENT, not a
    closure, so the int8 kernels don't become HLO constants (a remote
    compiler rejects multi-hundred-MB constant programs)."""

    def eval_step(state: TrainState, batch, extra_vars=None):
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        if extra_vars:
            variables.update(extra_vars)
        images = batch["image"]
        if normalize_fn is not None:
            images = normalize_fn(images)
        preds = (apply_fn or state.apply_fn)(variables, images, train=False,
                                             deterministic=True)
        decoded = objective.decode_predictions(preds, state.scaler)
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones(batch["image"].shape[0], bool)
        m = mask.astype(jnp.float32)

        target = batch["target"]
        if decoded.ndim == 1:
            target = target.reshape(-1)
        err = decoded - target
        sums = {
            "count": jnp.sum(m),
            "sq_err": jnp.sum((err.T * m).T ** 2) if err.ndim > 1
                      else jnp.sum(err ** 2 * m),
            "abs_err": jnp.sum((jnp.abs(err).T * m).T) if err.ndim > 1
                       else jnp.sum(jnp.abs(err) * m),
        }
        if decoded.ndim > 1:  # geopose: per-axis sums
            sums["abs_err_lat"] = jnp.sum(jnp.abs(err[:, 0]) * m)
            sums["abs_err_lon"] = jnp.sum(jnp.abs(err[:, 1]) * m)
            sums["sq_err_lat"] = jnp.sum(err[:, 0] ** 2 * m)
            sums["sq_err_lon"] = jnp.sum(err[:, 1] ** 2 * m)
        else:  # angle: ALL error sums are circular — a raw (decoded -
            # target) difference is meaningless across the 0/360 wrap (and
            # the train manifest has targets up to 750 deg)
            from geovpr.objectives.losses import angular_error_deg
            ang = angular_error_deg(decoded, target)
            sums["ang_err"] = jnp.sum(ang * m)
            sums["sq_err"] = jnp.sum(ang ** 2 * m)
            sums["abs_err"] = sums["ang_err"]
        return sums, decoded

    return eval_step


def summarize_eval(objective, sums: dict) -> dict:
    """Host-side reduction of accumulated eval sums into the reference's
    metric suite (validation_swin_2.py:191-195 / en_finetuning_gemini.py:235)."""
    n = max(float(sums["count"]), 1.0)
    out = {}
    if "ang_err" in sums:
        out["maae"] = float(sums["ang_err"]) / n
        out["mse"] = float(sums["sq_err"]) / n
    else:
        # geopose: MSE averaged over both axes = competition loss
        out["mse"] = float(sums["sq_err"]) / (2 * n)
        out["rmse"] = out["mse"] ** 0.5
        out["mae"] = float(sums["abs_err"]) / (2 * n)
        out["mae_lat"] = float(sums["abs_err_lat"]) / n
        out["mae_lon"] = float(sums["abs_err_lon"]) / n
        out["competition_loss"] = out["mse"]
    return out

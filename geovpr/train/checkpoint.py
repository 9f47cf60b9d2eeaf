"""Checkpointing via Orbax.

Reference semantics reproduced (SURVEY.md §5):
- per-epoch full checkpoints incl. optimizer state and step
  (`swin_attempt_2.py:239-247`),
- separate best-model checkpoint (`swin_attempt_2.py:252-255`),
- resume from any epoch restoring model+optimizer+epoch
  (`swin_finetuning_bigger_model.py:76-84`),
- the target-scaler statistics travel INSIDE the checkpoint (the reference
  pickles sklearn scalers next to the weights, `swin_attempt_2.py:139`),
- run-dir naming `training_{name}_{%Y%m%d_%H%M%S}` (`swin_attempt_2.py:24`).

Orbax gives atomic writes and async-save capability (preemption-safe), which
the reference's torch.save lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from geovpr.objectives.scaler import ScalerState
from geovpr.train.state import TrainState


def _to_save(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "scaler": {"mean": state.scaler.mean, "scale": state.scaler.scale},
        "rng": state.rng,
    }


_ASYNC_CKPTR = None
_PENDING_METADATA: list = []


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def _flush_metadata():
    import json

    while _PENDING_METADATA:
        path, epoch, metrics = _PENDING_METADATA.pop()
        with open(os.path.join(path, "run_metrics.json"), "w") as f:
            json.dump({"epoch": epoch, **{k: float(v) for k, v in
                                          (metrics or {}).items()}}, f)


def wait_for_saves():
    """Block until all in-flight async checkpoint writes land (atomic on
    completion — Orbax renames from a tmp dir, so preemption mid-write never
    leaves a truncated checkpoint)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _flush_metadata()


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    metrics: Optional[dict] = None,
                    async_save: bool = False):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"state": _to_save(state), "epoch": np.int64(epoch)}
    if async_save:
        # device->host copy happens synchronously inside save(); the disk
        # write proceeds on a background thread while training continues.
        # The metrics sidecar is deferred to wait_for_saves() — the target
        # dir must not exist before Orbax's atomic tmp->final rename.
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()
        _flush_metadata()
        ckptr.save(path, payload, force=True)
        _PENDING_METADATA.append((path, epoch, metrics))
        return
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    # metrics are human-readable metadata, not restore targets
    with open(os.path.join(path, "run_metrics.json"), "w") as f:
        json.dump({"epoch": epoch, **{k: float(v) for k, v in
                                      (metrics or {}).items()}}, f)


def restore_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    """Restore into the structure of `state` (which supplies apply_fn/tx and
    the abstract tree). Returns (state, epoch).

    Restore targets take the TEMPLATE arrays' shardings (not the ones
    recorded in the checkpoint file), so a checkpoint saved on one topology
    restores correctly onto another — e.g. an 8-chip data-parallel run
    resumed on a 4x2 data x model mesh (tests/test_sharding.py covers the
    cross-mesh round trip)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        template = {"state": _to_save(state), "epoch": np.int64(0)}
        restore_args = {
            "state": ocp.checkpoint_utils.construct_restore_args(
                template["state"]),
            # scalar: construct_restore_args handles arrays only
            "epoch": ocp.RestoreArgs(restore_type=int),
        }
        restored = ckptr.restore(path, item=template,
                                 restore_args=restore_args)
    s = restored["state"]
    new_state = state.replace(
        step=jax.numpy.asarray(s["step"]),
        params=s["params"],
        batch_stats=s["batch_stats"],
        opt_state=s["opt_state"],
        scaler=ScalerState(mean=jax.numpy.asarray(s["scaler"]["mean"]),
                           scale=jax.numpy.asarray(s["scaler"]["scale"])),
        rng=jax.numpy.asarray(s["rng"]),
    )
    epoch = int(restored["epoch"])
    return new_state, epoch


def checkpoint_epoch(dirname: str) -> Optional[int]:
    """`checkpoint_{epoch}` -> epoch; None for anything else (incl. Orbax
    in-flight `*.orbax-checkpoint-tmp-*` dirs from async saves)."""
    if not dirname.startswith("checkpoint_"):
        return None
    try:
        return int(dirname.split("_", 1)[1])
    except ValueError:
        return None


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Find the newest `checkpoint_{epoch}` dir under a run dir."""
    if not os.path.isdir(run_dir):
        return None
    cands = [d for d in os.listdir(run_dir)
             if checkpoint_epoch(d) is not None]
    if not cands:
        return None
    best = max(cands, key=checkpoint_epoch)
    return os.path.join(run_dir, best)

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


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    metrics: Optional[dict] = None):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = {"state": _to_save(state), "epoch": np.int64(epoch)}
        ckptr.save(path, payload, force=True)
    # metrics are human-readable metadata, not restore targets
    with open(os.path.join(path, "run_metrics.json"), "w") as f:
        json.dump({"epoch": epoch, **{k: float(v) for k, v in
                                      (metrics or {}).items()}}, f)


def restore_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    """Restore into the structure of `state` (which supplies apply_fn/tx and
    the abstract tree). Returns (state, epoch)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        template = {"state": _to_save(state), "epoch": np.int64(0)}
        restored = ckptr.restore(path, item=template)
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


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Find the newest `checkpoint_{epoch}` dir under a run dir."""
    if not os.path.isdir(run_dir):
        return None
    cands = [d for d in os.listdir(run_dir) if d.startswith("checkpoint_")]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[1]))
    return os.path.join(run_dir, best)

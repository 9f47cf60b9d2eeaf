"""Shared CLI plumbing: preset -> restored Trainer."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def load_trained(preset: str, run_dir: str, checkpoint: str = "best",
                 image_root: str = "", mesh=None):
    """Build the preset's model and restore a checkpoint into a Trainer.

    Returns (trainer, cfg). `checkpoint` is 'best', 'latest', or a
    checkpoint dir name under `run_dir` (the run-dir layout written by
    Trainer.fit, mirroring the reference's per-run directories,
    swin_attempt_2.py:24-25).
    """
    from geovpr.cli.presets import build_preset, objective_for
    from geovpr.parallel import create_mesh
    from geovpr.train import Trainer
    from geovpr.train.checkpoint import latest_checkpoint, restore_checkpoint
    from geovpr.train.model import RegressionModel

    cfg = build_preset(preset)
    data = dataclasses.replace(cfg.data, image_root=image_root)
    trainer = Trainer(
        model=RegressionModel(config=dataclasses.replace(
            cfg.model, image_size=data.image_size)),
        objective=objective_for(cfg),
        optim_cfg=cfg.optim, train_cfg=cfg.train, data_cfg=data,
        mesh=mesh if mesh is not None else create_mesh(),
        has_batch_stats=(cfg.model.family == "efficientnet"),
        run_dir=run_dir)
    trainer.init_state((data.image_size, data.image_size, 3))

    if checkpoint == "latest":
        ckpt: Optional[str] = latest_checkpoint(run_dir)
    else:
        ckpt = os.path.join(run_dir, checkpoint)
    if ckpt is None or not os.path.isdir(ckpt):
        raise SystemExit(f"no checkpoint {checkpoint!r} under {run_dir}")
    try:
        trainer.state, _ = restore_checkpoint(ckpt, trainer.state)
    except Exception as e:
        # Freeze-then-unfreeze presets (freeze_backbone_epochs > 0): any
        # checkpoint written after the unfreeze has the phase-2 opt_state
        # tree, which doesn't match the frozen-phase template built above —
        # rebuild unfrozen and retry once (same recovery as cli/train.py's
        # resume path; without it evaluate/fuse crash for e.g.
        # dinov2_sincos_gemini past epoch 5)
        if not trainer._frozen_phase:
            raise
        trainer._unfreeze()
        try:
            trainer.state, _ = restore_checkpoint(ckpt, trainer.state)
        except Exception:
            raise RuntimeError(
                f"could not restore {ckpt} with either the frozen-phase or "
                f"unfrozen optimizer template") from e
    return trainer, cfg

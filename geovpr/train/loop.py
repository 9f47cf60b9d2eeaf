"""Host-side training driver.

One compiled train step + one compiled eval step; everything data-dependent
(epochs, shuffling, plateau LR, early stopping, best-model tracking,
checkpoint cadence) runs here on the host — mirroring the reference's loop
semantics (`swin_attempt_2.py:168-263`) without ever putting dynamic control
flow inside jit.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geovpr.core.config import DataConfig, OptimConfig, TrainConfig
from geovpr.data.pipeline import iterate_batches, prefetch_to_device
from geovpr.data.transforms import build_augment, normalize
from geovpr.objectives.scaler import ScalerState
from geovpr.train.checkpoint import save_checkpoint
from geovpr.train.optimizer import build_optimizer, get_lr_scale, set_lr_scale
from geovpr.train.state import TrainState, create_train_state
from geovpr.train.steps import make_eval_step, make_train_step, summarize_eval


@dataclasses.dataclass
class Trainer:
    model: Any
    objective: Any
    optim_cfg: OptimConfig
    train_cfg: TrainConfig
    data_cfg: DataConfig
    mesh: Optional[Any] = None
    has_batch_stats: bool = False
    pretrained_variables: Optional[dict] = None
    scaler: Optional[ScalerState] = None

    state: Optional[TrainState] = None
    run_dir: str = ""
    history: list = dataclasses.field(default_factory=list)

    def __post_init__(self):
        if not self.run_dir:
            stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            name = self.train_cfg.run_name or "run"
            # run-dir contract from the reference (swin_attempt_2.py:24-25)
            self.run_dir = os.path.join(self.train_cfg.save_dir,
                                        f"training_{name}_{stamp}")
        os.makedirs(self.run_dir, exist_ok=True)

        if self.train_cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        # head-only warmup phase (dino_v2_gemini.py:187-222): train with the
        # backbone frozen for `freeze_backbone_epochs`, then rebuild the
        # optimizer (fresh Adam moments, as the reference does) unfrozen.
        self._frozen_phase = self.optim_cfg.freeze_backbone_epochs > 0
        self._total_steps = 0
        self._steps_per_epoch = 0

        mean, std = self.data_cfg.mean, self.data_cfg.std
        self._normalize = lambda x: normalize(x, mean, std)
        aug = (build_augment(self.data_cfg.augment)
               if self.data_cfg.augment != "none" else None)
        self._train_step = jax.jit(
            make_train_step(self.objective, normalize_fn=self._normalize,
                            augment_fn=aug,
                            skip_nonfinite=self.train_cfg.skip_nonfinite_updates,
                            has_batch_stats=self.has_batch_stats),
            donate_argnums=(0,) if self.train_cfg.donate_state else ())
        self._eval_step = jax.jit(
            make_eval_step(self.objective, normalize_fn=self._normalize,
                           has_batch_stats=self.has_batch_stats))
        # w8a8 serving: enable_int8_serving() swaps the eval step and fills
        # this with the derived "quant" collection (passed as a jit ARG)
        self._extra_eval_vars: Optional[dict] = None

    # ------------------------------------------------------------------ setup
    def _phase_optim_cfg(self):
        if self._frozen_phase:
            return dataclasses.replace(self.optim_cfg, backbone_lr_scale=0.0)
        return self.optim_cfg

    def _unfreeze(self):
        """Switch to phase 2: full-model training with a rebuilt optimizer
        (reference rebuilds from scratch at `dino_v2_gemini.py:204-212`)."""
        self._frozen_phase = False
        cfg = self.optim_cfg
        if cfg.unfreeze_lr > 0:
            cfg = dataclasses.replace(cfg, lr=cfg.unfreeze_lr)
        tx = build_optimizer(cfg, params=None, total_steps=self._total_steps,
                             steps_per_epoch=self._steps_per_epoch)
        self.state = self.state.replace(
            tx=tx, opt_state=tx.init(self.state.params))

    def init_state(self, sample_image_shape, total_steps: int = 0,
                   steps_per_epoch: int = 0):
        self._total_steps = total_steps
        self._steps_per_epoch = steps_per_epoch
        tx = build_optimizer(self._phase_optim_cfg(), params=None,
                             total_steps=total_steps,
                             steps_per_epoch=steps_per_epoch)
        rng = jax.random.PRNGKey(self.train_cfg.seed)
        sample = jnp.zeros((1,) + tuple(sample_image_shape), jnp.float32)
        self.state = create_train_state(
            self.model, tx, rng, sample,
            scaler=self.scaler, out_dim=self.objective.out_dim,
            pretrained_variables=self.pretrained_variables)
        return self.state

    def restore_latest(self, run_dir: str, require: bool = False) -> int:
        """Restore `self.state` from the newest `checkpoint_{epoch}` under
        `run_dir` and return the epoch to continue at (SURVEY §5
        "best-checkpoint auto-restart": relaunching the same command after a
        crash/preemption picks the run up exactly where its last completed
        checkpoint left it; tests/test_train.py TestCrashRecovery SIGKILLs a
        run mid-epoch and proves the restarted trajectory matches an
        unbroken one).

        Returns 0 when no checkpoint exists — the auto-resume fresh-start
        case — unless `require` (the explicit `--resume` contract, where a
        missing checkpoint is an operator error). `init_state` must already
        have been called with the original run's schedule horizon."""
        from geovpr.train.checkpoint import (latest_checkpoint,
                                             restore_checkpoint)
        if self.state is None:
            raise RuntimeError("call init_state() before restore_latest()")
        ckpt = latest_checkpoint(run_dir)
        if ckpt is None:
            if require:
                raise FileNotFoundError(f"no checkpoint under {run_dir}")
            return 0
        try:
            self.state, ckpt_epoch = restore_checkpoint(ckpt, self.state)
        except Exception as e:
            # one legitimate mismatch exists: a checkpoint written in the
            # post-unfreeze phase has a different opt_state tree than the
            # frozen-warmup template — rebuild phase-2 and retry once,
            # chaining the original error if the retry fails too
            if not self._frozen_phase:
                raise
            self._unfreeze()
            try:
                self.state, ckpt_epoch = restore_checkpoint(ckpt, self.state)
            except Exception:
                raise RuntimeError(
                    f"could not restore {ckpt} with either the frozen-phase "
                    f"or unfrozen optimizer template") from e
        return ckpt_epoch + 1

    @staticmethod
    def steps_per_epoch(n: int, data_cfg: DataConfig) -> int:
        """Optimizer steps per epoch — the single source of truth shared
        with the resume path in cli/train.py (schedule horizons must match
        the original run exactly)."""
        bs = data_cfg.batch_size
        return max(n // bs if data_cfg.drop_remainder_train else -(-n // bs),
                   1)

    # ------------------------------------------------------------------- fit
    def fit(self, train_source, val_source=None,
            epochs: Optional[int] = None, start_epoch: int = 0) -> list:
        """Train for epochs [start_epoch, epochs). `start_epoch` > 0 resumes
        mid-run (after `restore_checkpoint`): checkpoint numbering, shuffle
        seeds, the freeze/unfreeze phase, the best-metric, and the
        early-stop/plateau counters all continue where the original run
        stopped (reference resume: swin_finetuning_bigger_model.py:76-84;
        counters travel in each checkpoint's run_metrics.json sidecar so a
        resumed run early-stops and decays LR on the same epoch an unbroken
        run would)."""
        cfg = self.train_cfg
        epochs = epochs or cfg.epochs
        bs = self.data_cfg.batch_size
        n = len(train_source)
        if self.data_cfg.drop_remainder_train and n < bs:
            raise ValueError(
                f"dataset ({n} rows) smaller than batch_size ({bs}) with "
                f"drop_remainder_train=True: every epoch would train zero "
                f"steps. Lower the batch size or disable drop_remainder.")
        steps_per_epoch = self.steps_per_epoch(n, self.data_cfg)

        if self.state is None:
            img = train_source.get_batch(np.array([0]))["image"][0]
            self.init_state(img.shape, total_steps=steps_per_epoch * epochs,
                            steps_per_epoch=steps_per_epoch)
        # resuming past the warmup boundary: rebuild the phase-2 optimizer
        # (fresh moments — the reference's unfreeze also rebuilds, so this
        # matches its semantics even on resume)
        if (self._frozen_phase
                and start_epoch >= self.optim_cfg.freeze_backbone_epochs):
            self._unfreeze()

        # frozen-feature cache: with a fully-frozen backbone and no
        # augmentation, extract features ONCE and train the head on them —
        # identical trajectory, epochs become head-bound (the reference
        # recomputes the frozen forward every step for 100 epochs,
        # dinov2salad_finetuning.py:35-36)
        cached = self._maybe_cache_frozen_features(train_source, val_source)
        if cached is not None:
            train_source, val_source, train_step, cached_eval = cached
        else:
            train_step, cached_eval = self._train_step, None

        best = float("inf")
        best_epoch = -1
        bad_epochs = 0
        plateau_bad = 0
        if start_epoch > 0:
            # carry the prior run's best metric forward so a resumed epoch
            # can't overwrite run_dir/best with a worse model
            meta = os.path.join(self.run_dir, "best", "run_metrics.json")
            if os.path.exists(meta):
                with open(meta) as f:
                    prior = json.load(f)
                best = float(prior.get(self.objective.monitor, best))
                best_epoch = int(prior.get("epoch", -1))
            # early-stop/plateau counters from the checkpoint we resumed at
            # (its run_metrics.json sidecar); without them a resumed run
            # would restart both at 0 — up to patience-1 extra non-improving
            # epochs and a delayed plateau LR decay
            side = os.path.join(self.run_dir,
                                f"checkpoint_{start_epoch - 1}",
                                "run_metrics.json")
            if os.path.exists(side):
                with open(side) as f:
                    counters = json.load(f)
                bad_epochs = int(counters.get("bad_epochs", bad_epochs))
                plateau_bad = int(counters.get("plateau_bad", plateau_bad))
                best = float(counters.get("best", best))
                best_epoch = int(counters.get("best_epoch", best_epoch))

        for epoch in range(start_epoch, epochs):
            if (self._frozen_phase
                    and epoch >= self.optim_cfg.freeze_backbone_epochs):
                self._unfreeze()
            t0 = time.time()
            train_metrics = []
            batches = iterate_batches(
                train_source, bs, shuffle=True, seed=cfg.seed, epoch=epoch,
                drop_remainder=self.data_cfg.drop_remainder_train)
            step_in_epoch = 0
            profiling = False
            for batch in prefetch_to_device(batches, self.mesh,
                                            self.data_cfg.prefetch_depth):
                batch.pop("_indices", None)
                # device trace of a few steady-state steps (skip step 0: it
                # is the compile step)
                if (cfg.profile and epoch == 0 and step_in_epoch == 1
                        and not profiling):
                    jax.profiler.start_trace(
                        os.path.join(self.run_dir, "profile"))
                    profiling = True
                self.state, m = train_step(self.state, batch)
                train_metrics.append(m)
                step_in_epoch += 1
                if profiling and step_in_epoch >= 1 + cfg.profile_steps:
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
            if profiling:
                jax.profiler.stop_trace()
            losses = np.array([float(m["loss"]) for m in train_metrics])
            skips = np.array([float(m["skipped"]) for m in train_metrics])
            applied = skips < 0.5
            # mean over APPLIED updates only — skipped steps report loss 0,
            # which would deflate the epoch mean exactly when training is
            # least stable
            train_loss = float(losses[applied].mean()) if applied.any() \
                else float("nan")
            skipped = int(skips.sum())

            record = {"epoch": epoch, "train_loss": train_loss,
                      "skipped_updates": skipped,
                      "lr_scale": get_lr_scale(self.state.opt_state),
                      "seconds": round(time.time() - t0, 2)}

            if val_source is not None:
                val = self.evaluate(val_source, _step=cached_eval)
                record.update({f"val_{k}": v for k, v in val.items()})
                monitored = val[self.objective.monitor]

                # plateau LR (ReduceLROnPlateau, swin_attempt_2.py:159)
                if self.optim_cfg.schedule == "plateau":
                    if monitored < best - 1e-12:
                        plateau_bad = 0
                    else:
                        plateau_bad += 1
                        if plateau_bad > self.optim_cfg.plateau_patience:
                            new_scale = (get_lr_scale(self.state.opt_state)
                                         * self.optim_cfg.plateau_factor)
                            self.state = self.state.replace(
                                opt_state=set_lr_scale(self.state.opt_state,
                                                       new_scale))
                            plateau_bad = 0
                            record["lr_scale"] = new_scale

                # best-model tracking + early stop (swin_attempt_2.py:250-263)
                if monitored < best:
                    best = monitored
                    best_epoch = epoch
                    bad_epochs = 0
                    save_checkpoint(os.path.join(self.run_dir, "best"),
                                    self.state, epoch, val,
                                    async_save=cfg.async_checkpoint)
                else:
                    bad_epochs += 1

            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                save_checkpoint(
                    os.path.join(self.run_dir, f"checkpoint_{epoch}"),
                    self.state, epoch,
                    # counters ride the sidecar so resume continues them
                    metrics={"bad_epochs": bad_epochs,
                             "plateau_bad": plateau_bad,
                             "best": best, "best_epoch": best_epoch},
                    async_save=cfg.async_checkpoint)
                self._prune_checkpoints()

            self.history.append(record)
            with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(record) + "\n")

            if (cfg.early_stop_patience
                    and bad_epochs >= cfg.early_stop_patience):
                break

        if cfg.async_checkpoint:
            from geovpr.train.checkpoint import wait_for_saves
            wait_for_saves()
        self.history_summary = {"best": best, "best_epoch": best_epoch}
        return self.history

    def _maybe_cache_frozen_features(self, train_source, val_source):
        """Frozen-feature cache eligibility + extraction.

        Returns (train_source, val_source, train_step, eval_step) over
        cached pooled features, or None when ineligible. Eligible iff the
        model's backbone is FULLY frozen (ModelConfig.freeze_backbone — the
        optimizer also set_to_zeros its updates), there is no augmentation
        (features must be identical every epoch), and the model has no
        batch stats (frozen BN would still see per-batch data). The cached
        features are bit-identical to what the full forward would feed the
        head (same normalize, same deterministic backbone — DropPath is
        inert on these configs), so the training trajectory is unchanged
        (tests/test_train.py TestFrozenFeatureCache)."""
        model_cfg = getattr(self.model, "config", None)
        if not (self.train_cfg.cache_frozen_features
                and model_cfg is not None
                and getattr(model_cfg, "freeze_backbone", False)
                and self.data_cfg.augment == "none"
                and not self.has_batch_stats):
            return None

        import functools

        from geovpr.data.pipeline import ArraySource

        extract = jax.jit(lambda params, images: self.model.apply(
            {"params": params}, self._normalize(images),
            method="pooled_features"))

        def cache(source):
            n = len(source)
            feats = targets = None
            for batch in prefetch_to_device(
                    iterate_batches(source, self.data_cfg.batch_size),
                    self.mesh, self.data_cfg.prefetch_depth):
                idx = batch.pop("_indices")
                f = np.asarray(extract(self.state.params, batch["image"]),
                               np.float32)
                t = np.asarray(batch["target"], np.float32)
                if feats is None:
                    feats = np.zeros((n, f.shape[-1]), np.float32)
                    targets = np.zeros((n,) + t.shape[1:], np.float32)
                feats[idx] = f[:len(idx)]
                targets[idx] = t[:len(idx)]
            return ArraySource(images=feats, targets=targets)

        head_apply = functools.partial(self.model.apply, method="head_only")
        train_step = jax.jit(
            make_train_step(self.objective, normalize_fn=None,
                            augment_fn=None,
                            skip_nonfinite=self.train_cfg.skip_nonfinite_updates,
                            has_batch_stats=False, apply_fn=head_apply),
            donate_argnums=(0,) if self.train_cfg.donate_state else ())
        eval_step = jax.jit(
            make_eval_step(self.objective, normalize_fn=None,
                           has_batch_stats=False, apply_fn=head_apply))
        return (cache(train_source),
                cache(val_source) if val_source is not None else None,
                train_step, eval_step)

    def _prune_checkpoints(self):
        keep = self.train_cfg.keep_checkpoints
        if not keep:
            return
        from geovpr.train.checkpoint import checkpoint_epoch
        cands = sorted(
            (d for d in os.listdir(self.run_dir)
             if checkpoint_epoch(d) is not None),  # skips Orbax tmp dirs
            key=checkpoint_epoch)
        for d in cands[:-keep]:
            import shutil
            shutil.rmtree(os.path.join(self.run_dir, d), ignore_errors=True)

    # ------------------------------------------------------------------ eval
    def enable_int8_serving(self, source) -> None:
        """Swap evaluate/predict onto the w8a8 serving path: calibrate
        static activation scales on the first batch of `source`, derive the
        "quant" collection from the restored f32 params, and rebuild the
        jitted eval step around an int8 model clone. Training state and
        checkpoints are untouched (the quant collection is derived, see
        geovpr/models/quantize.py). Raises for families without an int8
        path (EfficientNet — registry.supports_int8)."""
        from geovpr.models.quantize import quantize_for_serving

        batch = next(iter(iterate_batches(source, self.data_cfg.batch_size)))
        images = self._normalize(jnp.asarray(batch["image"]))
        variables = {"params": self.state.params}
        if self.has_batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        quantized = quantize_for_serving(self.model, variables, [images])
        self._extra_eval_vars = {"quant": quantized["quant"]}
        int8_model = self.model.clone(int8_mlp=True)
        self._eval_step = jax.jit(
            make_eval_step(self.objective, normalize_fn=self._normalize,
                           has_batch_stats=self.has_batch_stats,
                           apply_fn=int8_model.apply))

    def evaluate(self, source, _step=None) -> dict:
        """`_step` overrides the compiled eval step (the frozen-feature
        cache evaluates the head on cached features); extra eval vars (int8
        quant collection) only apply to the default step."""
        if len(source) == 0:
            raise ValueError("evaluate() on an empty source — check the val "
                             "CSV / --image-root (missing-file screening "
                             "may have dropped every row)")
        step = _step or self._eval_step
        extra = None if _step is not None else self._extra_eval_vars
        sums = None
        for batch in prefetch_to_device(
                iterate_batches(source, self.data_cfg.batch_size),
                self.mesh, self.data_cfg.prefetch_depth):
            batch.pop("_indices", None)
            s, _ = step(self.state, batch, extra)
            # accumulate ON DEVICE; a float() here would force a host sync
            # per batch and serialize eval dispatch
            sums = s if sums is None else jax.tree_util.tree_map(
                jnp.add, sums, s)
        sums = {k: float(v) for k, v in sums.items()}
        return summarize_eval(self.objective, sums)

    def predict(self, source) -> np.ndarray:
        """Decoded predictions for every row of `source`, in source order."""
        _, preds = self.evaluate_and_predict(source)
        return preds

    def evaluate_and_predict(self, source) -> tuple:
        """Metrics + per-row decoded predictions in ONE inference pass —
        the eval step already returns both, so callers that need metrics
        and a prediction CSV (cli/evaluate.py) don't forward twice."""
        if len(source) == 0:
            raise ValueError("predict on an empty source — check the CSV / "
                             "image root")
        sums = None
        out = None
        for batch in prefetch_to_device(
                iterate_batches(source, self.data_cfg.batch_size),
                self.mesh, self.data_cfg.prefetch_depth):
            idx = batch.pop("_indices")
            s, decoded = self._eval_step(self.state, batch,
                                         self._extra_eval_vars)
            sums = s if sums is None else jax.tree_util.tree_map(
                jnp.add, sums, s)
            decoded = np.asarray(decoded)
            if out is None:
                out = np.zeros((len(source),) + decoded.shape[1:], np.float32)
            out[idx] = decoded[:len(idx)]
        metrics = summarize_eval(self.objective,
                                 {k: float(v) for k, v in sums.items()})
        return metrics, out

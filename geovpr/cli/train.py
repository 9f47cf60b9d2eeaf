"""Training entry point.

    python -m geovpr.cli.train --preset swin_b384_gemini2 \
        --train-csv labels_train.csv --val-csv labels_val.csv \
        --image-root dataset/images --save-dir runs

Replaces the reference's 16 hard-coded trainer scripts with one config-driven
entry (SURVEY.md §5 "Config / flag system": the reference bakes absolute
/home paths and constants into every file).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", required=True)
    p.add_argument("--train-csv", required=True)
    p.add_argument("--val-csv", default="")
    p.add_argument("--image-root", required=True)
    p.add_argument("--save-dir", default="runs")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--pretrained", default="",
                   help="flax-msgpack BACKBONE variables to initialize from "
                        "(head stays fresh); produce the file from a torch/"
                        "HF/hub checkpoint with `python -m geovpr.cli."
                        "convert` (the reference's pretrained loads, e.g. "
                        "swin_attempt_2.py:117)")
    p.add_argument("--resume", default="", help="run dir to resume from "
                   "(errors if it holds no checkpoint)")
    p.add_argument("--auto-resume", default="",
                   help="run dir for idempotent relaunch: resume from its "
                        "latest checkpoint if one exists, else start a "
                        "FRESH run in exactly this dir. A supervisor/"
                        "preemption restart loop can re-issue the same "
                        "command unconditionally (SURVEY §5 best-checkpoint "
                        "auto-restart; the reference's crash story is "
                        "'rerun by hand', swin_finetuning_bigger_model.py)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few steady-state "
                        "steps into <run_dir>/profile")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="overlap Orbax checkpoint writes with training")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host fleet: call jax.distributed.initialize "
                        "(auto-detected on TPU pods) BEFORE any jax use, so "
                        "jax.devices() spans every host and the mesh can "
                        "carry a DCN axis (geovpr.parallel."
                        "create_hybrid_mesh)")
    p.add_argument("--coordinator", default="",
                   help="with --multihost off-pod: coordinator address "
                        "host:port (also set --num-processes/--process-id)")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=-1)
    args = p.parse_args(argv)
    if args.resume and args.auto_resume:
        p.error("--resume and --auto-resume are mutually exclusive")

    if args.multihost:
        from geovpr.parallel import initialize_distributed
        initialize_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)

    import jax.numpy as jnp

    from geovpr.cli.presets import build_preset, objective_for
    from geovpr.core.config import AngleConfig, GeoposeConfig
    from geovpr.data.manifest import load_manifest
    from geovpr.data.pipeline import ImageFolderSource
    from geovpr.objectives.scaler import fit_scaler
    from geovpr.parallel import create_mesh
    from geovpr.train import Trainer
    from geovpr.train.model import RegressionModel

    cfg = build_preset(args.preset)
    data = dataclasses.replace(
        cfg.data, train_csv=args.train_csv, val_csv=args.val_csv,
        image_root=args.image_root,
        **({"batch_size": args.batch_size} if args.batch_size else {}))
    train_cfg = dataclasses.replace(
        cfg.train, save_dir=args.save_dir,
        profile=args.profile, async_checkpoint=args.async_checkpoint,
        **({"epochs": args.epochs} if args.epochs else {}),
        **({"seed": args.seed} if args.seed >= 0 else {}))

    train_manifest = load_manifest(args.train_csv, args.image_root,
                                   data.screen_missing_files,
                                   data.screen_corrupt_images)
    val_manifest = (load_manifest(args.val_csv, args.image_root)
                    if args.val_csv else None)

    is_geo = isinstance(cfg, GeoposeConfig)
    train_targets = (train_manifest.latlon if is_geo else train_manifest.angle)
    scaler = None
    if is_geo and cfg.scale_targets:
        # fit on TRAIN targets only (swin_attempt_2.py:135-137)
        scaler = fit_scaler(jnp.asarray(train_targets))

    def make_source(manifest, resize_to=0, role="train"):
        targets = manifest.latlon if is_geo else manifest.angle
        source = ImageFolderSource(
            paths=manifest.paths(), targets=np.asarray(targets),
            image_size=data.image_size,
            num_threads=data.num_decode_threads,
            filenames=manifest.filenames,
            decoder=data.decoder,
            resize_to=resize_to)
        if data.cache_decoded:
            from geovpr.data.pipeline import CachedImageSource
            # per-role cache files: train and val caching into ONE memmap
            # would truncate each other's backing file
            path = ("" if data.cache_decoded == "ram"
                    else f"{data.cache_decoded}.{role}.npy")
            source = CachedImageSource(source, cache_path=path)
        return source

    pretrained = None
    if args.pretrained:
        # BACKBONE variables from geovpr.models.convert_torch (flax msgpack)
        # — always nested under "backbone" to match RegressionModel's tree.
        # (A key-presence heuristic would misfire: convert_salad_hub output
        # itself contains a top-level "backbone" subtree.)
        from flax.serialization import msgpack_restore
        with open(args.pretrained, "rb") as f:
            pretrained = msgpack_restore(f.read())
        pretrained = {k: {"backbone": v} for k, v in pretrained.items()}

    model = RegressionModel(config=dataclasses.replace(
        cfg.model, image_size=data.image_size))
    trainer = Trainer(
        model=model,
        objective=objective_for(cfg),
        optim_cfg=cfg.optim,
        train_cfg=train_cfg,
        data_cfg=data,
        mesh=create_mesh(),
        has_batch_stats=(cfg.model.family == "efficientnet"),
        scaler=scaler,
        pretrained_variables=pretrained,
        # resuming continues the ORIGINAL run dir — naming one here would
        # also create a stray empty timestamped dir. --auto-resume pins the
        # run dir either way so a later relaunch finds the same run.
        run_dir=args.resume or args.auto_resume or "",
    )

    steps_per_epoch = Trainer.steps_per_epoch(
        len(train_manifest.filenames), data)
    start_epoch = 0
    resume_dir = args.resume or args.auto_resume
    if resume_dir:
        # schedules need the SAME step horizon as the original run —
        # total_steps=0 would give cosine schedules a 1-step horizon and
        # silently zero the LR for the whole resumed run
        trainer.init_state((data.image_size, data.image_size, 3),
                           total_steps=steps_per_epoch * train_cfg.epochs,
                           steps_per_epoch=steps_per_epoch)
        try:
            start_epoch = trainer.restore_latest(
                resume_dir, require=bool(args.resume))
        except FileNotFoundError as e:
            raise SystemExit(str(e))
        if start_epoch:
            print(f"resumed {resume_dir}; continuing at epoch {start_epoch}")
        else:
            print(f"no checkpoint under {resume_dir}; starting fresh there")

    # validation uses the eval-time transform (e.g. Resize(256)+CenterCrop,
    # validation_script.py:124-129) so best-checkpoint selection scores the
    # same input distribution cli/evaluate.py later reports on
    history = trainer.fit(
        make_source(train_manifest),
        make_source(val_manifest, data.eval_resize_to, role="val")
        if val_manifest else None,
        start_epoch=start_epoch)
    print(json.dumps({"run_dir": trainer.run_dir,
                      "final": history[-1] if history else {}}))


if __name__ == "__main__":
    main()

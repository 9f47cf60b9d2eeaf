"""Real-weights quality-parity harness.

    python -m geovpr.cli.parity --assets /path/to/assets [--out report.json]

The converters, presets, golden metric replays, and CSV contracts are all
individually tested in CI — but the final proof of quality parity needs the
reference's REAL trained checkpoints and the real IIIT-campus validation
images, which are gitignored out of the reference snapshot
(`/root/reference/.gitignore:1-3`: `dataset/iiit_dataset/*`, `*.pth`,
`*.pkl`) and cannot be downloaded here. This command is the one-shot
protocol for an environment that HAS those assets: it converts each trained
checkpoint, evaluates it on the real validation split with the exact
reference eval semantics, and diffs the measured metrics against the golden
numbers recomputed from the reference's committed prediction CSVs
(SURVEY.md §6).

Expected assets directory layout (legs with missing assets are skipped and
reported; any present leg that fails its threshold exits non-zero):

    assets/
      labels_val.csv            # 362-row val list (cleaned_dataset_files/)
      images/                   # the val images named in labels_val.csv
      swin_geopose/
        model_best.pth          # swin_attempt_2.py best checkpoint
        latlon_scaler.pkl       # its pickled StandardScaler (joblib)
      efficientnet_sincos/
        model_best.pth          # en_finetuning_gemini.py best checkpoint
      dinov2salad_geopose/
        model_best.pth          # dinov2salad_finetuning.py ckpt (full
                                # DINOv2RegressionModel incl. hub backbone)
        latlon_scaler.pkl
      salad/
        dino_salad.ckpt         # serizba/salad hub checkpoint
        reference_descriptors.npz   # optional: {"images": (N,H,W,3) uint8,
                                # "descriptors": (N, 8448) f32} dumped from
                                # the torch hub model — enables the
                                # descriptor-fidelity leg without torch
      parity_config.json        # optional per-leg overrides (see
                                # DEFAULT_LEGS; the CI stand-in tests use
                                # this to run tiny architectures through
                                # the full protocol)

Golden thresholds (recomputed from the reference's committed CSVs,
tests/test_golden_fixtures.py):
  swin_geopose         val MSE 20833.22 / RMSE 144.34
                       (training_gemini_2_20250505_004059/validation_predictions.csv)
  efficientnet_sincos  val MAAE 26.326 deg
                       (sincos/training_20250505_191535/validation_predictions.csv)
  dinov2salad_geopose  competition loss ~228000
                       (dinov2salad_validation.py:127 comment)
  salad                descriptor cosine >= 0.999 vs the torch hub model

A leg PASSES when the measured metric is within `tolerance_pct` of the
golden value OR BETTER (lower) — the converted model may legitimately beat
the reference's own number because eval here runs deterministic f32/bf16
with exact resize, while the reference's number includes its own eval-time
noise.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

DEFAULT_LEGS = {
    "swin_geopose": {
        "recipe": "swin_geopose",
        "preset": "swin_b384_gemini2",
        "checkpoint": "model_best.pth",
        "scaler": "latlon_scaler.pkl",
        "golden": {"mse": 20833.22, "rmse": 144.34},
        "kind": "geopose",
    },
    "efficientnet_sincos": {
        "recipe": "efficientnet_sincos",
        "preset": "efficientnet_sincos_gemini",
        "checkpoint": "model_best.pth",
        "golden": {"maae": 26.326},
        "kind": "angle",
    },
    "dinov2salad_geopose": {
        "recipe": "dinov2salad_geopose",
        "preset": "dinov2salad_frozen_mlp",
        "checkpoint": "model_best.pth",
        "scaler": "latlon_scaler.pkl",
        # reference records ~228000 as an in-comment observation, not a CSV
        # replay — treat it as an upper bound with slack
        "golden": {"competition_loss": 228000.0},
        "kind": "geopose",
    },
    "salad": {
        "recipe": None,          # backbone-only leg (no head)
        "checkpoint": "dino_salad.ckpt",
        "golden": {"descriptor_cosine_min": 0.999},
        "kind": "descriptor",
    },
}


def _load_scaler(path: str):
    """Reference scalers are sklearn StandardScalers pickled with joblib
    (swin_attempt_2.py:139). Also accepts an .npz with mean/scale."""
    import jax.numpy as jnp

    from geovpr.objectives.scaler import ScalerState

    if path.endswith(".npz"):
        z = np.load(path)
        return ScalerState(mean=jnp.asarray(z["mean"], jnp.float32),
                           scale=jnp.asarray(z["scale"], jnp.float32))
    import joblib
    sk = joblib.load(path)
    return ScalerState(mean=jnp.asarray(sk.mean_, jnp.float32),
                       scale=jnp.asarray(sk.scale_, jnp.float32))


def _build_trainer(leg: dict, variables: dict, scaler, image_root: str):
    from geovpr.cli.presets import build_preset, objective_for
    from geovpr.parallel import create_mesh
    from geovpr.train import Trainer
    from geovpr.train.model import RegressionModel

    cfg = build_preset(leg["preset"])
    model_cfg = cfg.model
    data_cfg = dataclasses.replace(cfg.data, image_root=image_root)
    for k, v in leg.get("model_overrides", {}).items():
        model_cfg = dataclasses.replace(model_cfg, **{k: v})
    for k, v in leg.get("data_overrides", {}).items():
        data_cfg = dataclasses.replace(data_cfg, **{k: v})
    model_cfg = dataclasses.replace(model_cfg, image_size=data_cfg.image_size)
    trainer = Trainer(
        model=RegressionModel(config=model_cfg),
        objective=objective_for(cfg),
        optim_cfg=cfg.optim, train_cfg=cfg.train, data_cfg=data_cfg,
        mesh=create_mesh(),
        has_batch_stats=(model_cfg.family == "efficientnet"),
        pretrained_variables=variables, scaler=scaler,
        run_dir=leg["_out_dir"])
    trainer.init_state((data_cfg.image_size, data_cfg.image_size, 3))
    return trainer, cfg, data_cfg


def _judge(measured: dict, golden: dict, tolerance_pct: float):
    """Each golden metric passes when measured <= golden * (1 + tol) —
    lower (better) always passes; `*_min` metrics invert."""
    verdicts = {}
    ok = True
    for name, want in golden.items():
        got = measured.get(name)
        if got is None:
            verdicts[name] = {"golden": want, "measured": None,
                              "pass": False, "why": "metric missing"}
            ok = False
            continue
        if name.endswith("_min"):
            passed = got >= want * (1 - tolerance_pct / 100.0)
        else:
            passed = got <= want * (1 + tolerance_pct / 100.0)
        verdicts[name] = {"golden": want, "measured": round(float(got), 4),
                          "pass": bool(passed)}
        ok &= passed
    return verdicts, ok


def _run_model_leg(name: str, leg: dict, assets: str, out_dir: str,
                   tolerance_pct: float, max_images: int) -> dict:
    """Convert + evaluate one trained-checkpoint leg; returns its report."""
    from geovpr.cli.convert import load_state_dict
    from geovpr.data.manifest import load_manifest
    from geovpr.data.pipeline import ImageFolderSource
    from geovpr.models.convert_reference import convert_reference_checkpoint
    from geovpr.pipeline.export import (write_angle_validation_csv,
                                        write_geopose_validation_csv)

    ckpt = os.path.join(assets, name, leg["checkpoint"])
    sd = load_state_dict(ckpt)
    conv_kwargs = leg.get("convert_overrides", {})
    variables = convert_reference_checkpoint(leg["recipe"], sd, **conv_kwargs)

    scaler = None
    if leg.get("scaler"):
        scaler = _load_scaler(os.path.join(assets, name, leg["scaler"]))

    leg = dict(leg, _out_dir=os.path.join(out_dir, name))
    image_root = os.path.join(assets, "images")
    trainer, cfg, data_cfg = _build_trainer(leg, variables, scaler,
                                            image_root)

    manifest = load_manifest(
        os.path.join(assets, leg.get("val_csv", "labels_val.csv")),
        image_root)
    is_geo = leg["kind"] == "geopose"
    targets = manifest.latlon if is_geo else manifest.angle
    names = manifest.filenames
    paths = manifest.paths()
    if max_images and len(paths) > max_images:
        paths, targets, names = (paths[:max_images], targets[:max_images],
                                 names[:max_images])
    source = ImageFolderSource(paths=paths, targets=np.asarray(targets),
                               image_size=data_cfg.image_size,
                               filenames=names,
                               resize_to=data_cfg.eval_resize_to)
    metrics, preds = trainer.evaluate_and_predict(source)

    measured = {k: float(v) for k, v in metrics.items()}
    csv_path = os.path.join(leg["_out_dir"], "validation_predictions.csv")
    if is_geo:
        write_geopose_validation_csv(csv_path, names, np.asarray(targets),
                                     preds)
    else:
        write_angle_validation_csv(csv_path, names, np.asarray(targets),
                                   preds)

    verdicts, ok = _judge(measured, leg["golden"], tolerance_pct)
    return {"status": "pass" if ok else "fail", "checkpoint": ckpt,
            "n_images": len(paths), "metrics": measured,
            "verdicts": verdicts, "validation_csv": csv_path}


def _run_salad_leg(leg: dict, assets: str, tolerance_pct: float) -> dict:
    """Descriptor-fidelity leg: convert the hub checkpoint, extract
    descriptors for the images in reference_descriptors.npz, and compare
    cosine against the torch-side dump."""
    import jax
    import jax.numpy as jnp

    from geovpr.cli.convert import load_state_dict
    from geovpr.models import convert_torch as ct
    from geovpr.models.salad import DinoV2Salad

    ckpt = os.path.join(assets, "salad", leg["checkpoint"])
    ref_path = os.path.join(assets, "salad", "reference_descriptors.npz")
    if not os.path.exists(ref_path):
        return {"status": "skipped",
                "why": "salad/reference_descriptors.npz not provided (dump "
                       "it with the snippet in docs/PARITY.md)"}
    sd = load_state_dict(ckpt)
    z = np.load(ref_path)
    images, want = z["images"], z["descriptors"].astype(np.float32)
    size = images.shape[1]
    ov = leg.get("model_overrides", {})
    model = DinoV2Salad(variant=ov.get("variant", "base-14"),
                        image_size=size, dtype=jnp.float32,
                        **{k: v for k, v in ov.items() if k != "variant"})
    from geovpr.models.dinov2 import DINOV2_VARIANTS
    variables = ct.convert_salad_hub(
        sd, num_layers=DINOV2_VARIANTS[ov.get("variant", "base-14")]
        ["num_layers"], target_grid=size // 14)

    # the hub model normalizes with ImageNet stats inside its transform
    # (dinov2salad_finetuning.py:45-50); the dump stores raw uint8 images,
    # so apply the same normalization here
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255.0
    x = (images.astype(np.float32) - mean) / std
    got = np.asarray(jax.jit(
        lambda v, im: model.apply(v, im).pooled)(variables, jnp.asarray(x)),
        np.float32)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    measured = {"descriptor_cosine_min": float(cos.min()),
                "descriptor_cosine_mean": float(cos.mean())}
    verdicts, ok = _judge(measured, leg["golden"], tolerance_pct)
    return {"status": "pass" if ok else "fail", "checkpoint": ckpt,
            "n_images": int(images.shape[0]), "metrics": measured,
            "verdicts": verdicts}


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--assets", required=True,
                   help="directory with the real checkpoints/images (see "
                        "module docstring for the layout)")
    p.add_argument("--out", default="",
                   help="write the JSON report here (default: "
                        "<assets>/parity_report.json)")
    p.add_argument("--legs", default="",
                   help="comma-separated subset of legs to run "
                        f"(default: all present; known: "
                        f"{','.join(DEFAULT_LEGS)})")
    p.add_argument("--tolerance-pct", type=float, default=2.0,
                   help="pass threshold: measured within this %% of golden "
                        "(or better)")
    p.add_argument("--max-images", type=int, default=0,
                   help="cap the number of val images per leg (smoke runs)")
    args = p.parse_args(argv)

    assets = args.assets
    cfg_path = os.path.join(assets, "parity_config.json")
    legs = {k: dict(v) for k, v in DEFAULT_LEGS.items()}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            overrides = json.load(f)
        for name, ov in overrides.get("legs", {}).items():
            legs.setdefault(name, {}).update(ov)

    wanted = [s for s in args.legs.split(",") if s] or list(legs)
    out_dir = os.path.join(assets, "parity_out")
    os.makedirs(out_dir, exist_ok=True)

    report = {"assets": assets, "tolerance_pct": args.tolerance_pct,
              "legs": {}}
    any_fail = False
    for name in wanted:
        leg = legs[name]
        ckpt = os.path.join(assets, name, leg["checkpoint"])
        if not os.path.exists(ckpt):
            report["legs"][name] = {"status": "skipped",
                                    "why": f"{ckpt} not present"}
            continue
        if leg["kind"] == "descriptor":
            result = _run_salad_leg(leg, assets, args.tolerance_pct)
        else:
            result = _run_model_leg(name, leg, assets, out_dir,
                                    args.tolerance_pct, args.max_images)
        report["legs"][name] = result
        any_fail |= result["status"] == "fail"

    out = args.out or os.path.join(assets, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if any_fail:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

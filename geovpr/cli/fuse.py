"""Fused final-submission export — the reference's missing
`final_csv_generators/` stage (README.md:12 documents it; the directory is
absent from the snapshot, SURVEY.md §0). Its outputs are known from the
committed artifacts: sorted `test_predictions_sorted.csv` (geopose) and
`test_pred.csv` (angle).

    python -m geovpr.cli.fuse \
        --geopose-preset swin_b384_gemini2 --geopose-run runs/training_g2_x \
        --angle-preset efficientnet_sincos_gemini --angle-run runs/training_a_y \
        --test-dir dataset/test --out-dir final_csvs

Both heads share one decoded image stream; each model runs its own jitted
forward at its own resolution. Either head may be omitted.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--geopose-preset", default="")
    p.add_argument("--geopose-run", default="")
    p.add_argument("--angle-preset", default="")
    p.add_argument("--angle-run", default="")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--test-dir", required=True)
    p.add_argument("--out-dir", default="final_csvs")
    args = p.parse_args(argv)

    geo = bool(args.geopose_preset and args.geopose_run)
    ang = bool(args.angle_preset and args.angle_run)
    if bool(args.geopose_preset) != bool(args.geopose_run) or \
            bool(args.angle_preset) != bool(args.angle_run):
        raise SystemExit("--geopose-preset/--geopose-run (and the angle "
                         "pair) must be given together")
    if not geo and not ang:
        raise SystemExit("need at least one of --geopose-preset/--geopose-run "
                         "or --angle-preset/--angle-run")

    from geovpr.cli.common import load_trained
    from geovpr.data.manifest import list_test_images
    from geovpr.data.pipeline import ImageFolderSource
    from geovpr.pipeline.export import (
        write_angle_test_csv,
        write_geopose_test_csv,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    names = list_test_images(args.test_dir)
    paths = [os.path.join(args.test_dir, n) for n in names]
    outputs = {"num_images": len(names)}

    def predict(preset, run_dir, out_dim):
        trainer, cfg = load_trained(preset, run_dir, args.checkpoint)
        source = ImageFolderSource(
            paths=paths, targets=np.zeros((len(names), out_dim), np.float32),
            image_size=cfg.data.image_size, filenames=names,
            resize_to=cfg.data.eval_resize_to)
        return trainer.predict(source)

    if geo:
        latlon = predict(args.geopose_preset, args.geopose_run, 2)
        path = os.path.join(args.out_dir, "test_predictions_sorted.csv")
        write_geopose_test_csv(path, names, latlon)
        outputs["geopose_csv"] = path

    if ang:
        angle = predict(args.angle_preset, args.angle_run, 1)
        path = os.path.join(args.out_dir, "test_pred.csv")
        write_angle_test_csv(path, names, angle)
        outputs["angle_csv"] = path

    print(json.dumps(outputs))


if __name__ == "__main__":
    main()

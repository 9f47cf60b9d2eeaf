"""Golden-fixture tests: replay the reference's committed prediction CSVs.

The reference has no tests; its committed per-run `validation_predictions.csv`
files are the only executable spec (SURVEY.md §4). These tests recompute the
BASELINE.md headline metrics from those fixtures using *our* metric
implementations — proving our MAAE / MSE / competition-loss math reproduces
the reference numbers exactly.
"""

import csv
import os

import numpy as np
import jax.numpy as jnp
import pytest

from geovpr.objectives import competition_loss, maae_deg
from geovpr.objectives.losses import geopose_metrics

GEO_CSV = ("swin_transformer/training_gemini_2_20250505_004059/"
           "validation_predictions.csv")
ANGLE_CSV_26 = ("angle_prediction/efficientnet/sincos/training_20250505_191535/"
                "validation_predictions.csv")
ANGLE_CSV_27 = ("angle_prediction/efficientnet/sincos/training_20250504_175220/"
                "validation_predictions.csv")


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_geopose_golden_metrics(reference_root):
    rows = _read_csv(os.path.join(reference_root, GEO_CSV))
    assert len(rows) == 362  # val manifest size
    true = jnp.array([[float(r["true_latitude"]), float(r["true_longitude"])]
                      for r in rows])
    pred = jnp.array([[float(r["predicted_latitude"]),
                       float(r["predicted_longitude"])] for r in rows])
    m = geopose_metrics(pred, true)
    # BASELINE.md: MSE 20833.22, RMSE 144.34, MAE lat 92.88, MAE lon 101.44
    assert abs(float(m["mse"]) - 20833.22) < 1.0
    assert abs(float(m["rmse"]) - 144.34) < 0.05
    assert abs(float(m["mae_lat"]) - 92.88) < 0.05
    assert abs(float(m["mae_lon"]) - 101.44) < 0.05
    assert abs(float(competition_loss(pred, true)) - float(m["mse"])) < 1e-2


@pytest.mark.parametrize("rel_path,expected_maae", [
    (ANGLE_CSV_26, 26.326),
    (ANGLE_CSV_27, 27.128),
])
def test_angle_golden_maae(reference_root, rel_path, expected_maae):
    rows = _read_csv(os.path.join(reference_root, rel_path))
    assert len(rows) == 369  # extended val list
    true = jnp.array([float(r["true_angle"]) for r in rows])
    pred = jnp.array([float(r["predicted_angle"]) for r in rows])
    ours = float(maae_deg(pred, true))
    assert abs(ours - expected_maae) < 5e-3
    # cross-check against the per-row angular_error column the script wrote
    recorded = np.mean([float(r["angular_error"]) for r in rows])
    assert abs(ours - recorded) < 1e-3

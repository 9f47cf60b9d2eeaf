"""CSV export schema parity against the reference's committed files."""

import csv
import os

import numpy as np

from geovpr.pipeline import (
    write_angle_test_csv,
    write_angle_validation_csv,
    write_geopose_preds_csv,
    write_geopose_test_csv,
    write_geopose_validation_csv,
)


def _header(path):
    with open(path, newline="") as f:
        return next(csv.reader(f))


def _ref_header(reference_root, rel):
    return _header(os.path.join(reference_root, rel))


def test_geopose_validation_schema(tmp_path, reference_root):
    path = str(tmp_path / "validation_predictions.csv")
    write_geopose_validation_csv(
        path, ["img_0001.jpg", "img_0000.jpg"],
        np.array([[219698.0, 144782.0], [220182.0, 144211.0]]),
        np.array([[219977.234375, 144544.453125], [220123.8125, 144224.203125]]))
    assert _header(path) == _ref_header(
        reference_root,
        "swin_transformer/training_gemini_2_20250505_004059/validation_predictions.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    # %.6f float format (validation_swin_2.py:205)
    assert rows[0]["true_latitude"] == "219698.000000"
    assert rows[0]["error_latitude"] == "279.234375"


def test_geopose_test_schema_sorted(tmp_path, reference_root):
    path = str(tmp_path / "test_predictions_sorted.csv")
    write_geopose_test_csv(path, ["img_0002.jpg", "img_0000.jpg", "img_0001.jpg"],
                           np.array([[3.0, 3.5], [1.0, 1.5], [2.0, 2.5]]))
    assert _header(path) == _ref_header(
        reference_root,
        "swin_transformer/training_gemini_2_20250505_004059/test_predictions_sorted.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["filename"] for r in rows] == [
        "img_0000.jpg", "img_0001.jpg", "img_0002.jpg"]
    assert rows[0]["predicted_latitude"] == "1.000000"


def test_geopose_preds_submission(tmp_path, reference_root):
    path = str(tmp_path / "preds.csv")
    write_geopose_preds_csv(path, ["img_0010.jpg", "img_0002.jpg"],
                            np.array([[10.0, 1.0], [2.0, 0.2]]))
    assert _header(path) == _ref_header(
        reference_root, "swin_transformer/results_csv/preds.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["ID"] for r in rows] == ["2", "10"]  # numeric sort


def test_angle_validation_schema(tmp_path, reference_root):
    path = str(tmp_path / "validation_predictions.csv")
    write_angle_validation_csv(path, ["img_0000.jpg"],
                               np.array([311.0]), np.array([299.8626]))
    assert _header(path) == _ref_header(
        reference_root,
        "angle_prediction/efficientnet/sincos/training_20250505_191535/validation_predictions.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert abs(float(rows[0]["angular_error"]) - 11.1374) < 1e-3


def test_angle_test_schema(tmp_path, reference_root):
    ref = os.path.join(reference_root,
                       "angle_prediction/efficient_net/final_csvs/test_pred.csv")
    path = str(tmp_path / "test_pred.csv")
    write_angle_test_csv(path, ["b.jpg", "a.jpg"], np.array([10.0, 20.0]))
    assert _header(path) == _header(ref)
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["filename"] for r in rows] == ["a.jpg", "b.jpg"]

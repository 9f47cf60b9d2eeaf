"""Manifest loading semantics vs the reference dataset classes."""

import os

import numpy as np

from geovpr.data import list_test_images, load_manifest


def test_load_reference_train_manifest(reference_root):
    m = load_manifest(os.path.join(
        reference_root, "cleaned_dataset_files/labels_train.csv"))
    assert len(m) == 6378  # SURVEY §6 dataset scale
    assert m.latitude.min() >= 217757 and m.latitude.max() <= 221696
    assert m.longitude.min() >= 140523 and m.longitude.max() <= 146067
    assert m.angle.max() > 360  # raw angles exceed 360 in train
    assert set(np.unique(m.region_id)) <= set(range(1, 16))
    assert m.latlon.shape == (6378, 2)


def test_load_reference_val_manifests(reference_root):
    val = load_manifest(os.path.join(
        reference_root, "cleaned_dataset_files/labels_val.csv"))
    assert len(val) == 362
    val_ext = load_manifest(os.path.join(
        reference_root, "cleaned_dataset_files/labels_val copy.csv"))
    assert len(val_ext) == 369
    # the extended list is a superset
    assert set(val.filenames) <= set(val_ext.filenames)


def test_missing_file_screening(tmp_path, reference_root):
    # With an image_root where only some files exist, missing rows drop
    # silently (swin_attempt_2.py:67-74).
    root = tmp_path / "imgs"
    root.mkdir()
    (root / "img_0000.jpg").write_bytes(b"")
    m = load_manifest(
        os.path.join(reference_root, "cleaned_dataset_files/labels_val.csv"),
        image_root=str(root), screen_missing_files=True)
    assert m.filenames == ["img_0000.jpg"]


def test_test_image_listing(tmp_path):
    d = tmp_path / "test"
    d.mkdir()
    for n in ["b.jpg", "a.png", "c.txt", "D.JPEG"]:
        (d / n).write_bytes(b"")
    # glob by extension, sorted by name (val_and_test_swin_2.py:125-140)
    assert list_test_images(str(d)) == ["D.JPEG", "a.png", "b.jpg"]


def test_select_subset(reference_root):
    m = load_manifest(os.path.join(
        reference_root, "cleaned_dataset_files/labels_val.csv"))
    sub = m.select([0, 2])
    assert len(sub) == 2
    assert sub.filenames[0] == m.filenames[0]

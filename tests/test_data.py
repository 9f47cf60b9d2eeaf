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


class TestCachedImageSource:
    def test_cache_hits_and_matches(self, tmp_path):
        from PIL import Image
        from geovpr.data.pipeline import CachedImageSource, ImageFolderSource

        rng = np.random.default_rng(0)
        paths = []
        for i in range(6):
            p = str(tmp_path / f"im_{i}.jpg")
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)).save(p)
            paths.append(p)
        targets = np.arange(12, dtype=np.float32).reshape(6, 2)
        inner = ImageFolderSource(paths=paths, targets=targets, image_size=24)
        src = CachedImageSource(inner)

        idx = np.array([0, 2, 2, 5])
        first = src.get_batch(idx)
        want = inner.get_batch(idx)
        np.testing.assert_array_equal(first["image"], want["image"])
        # second fetch comes from cache even if the file vanishes
        os.remove(paths[2])
        again = src.get_batch(np.array([2]))
        np.testing.assert_array_equal(again["image"][0], want["image"][1])
        np.testing.assert_array_equal(first["target"], targets[idx])

    def test_memmap_backed(self, tmp_path):
        from PIL import Image
        from geovpr.data.pipeline import CachedImageSource, ImageFolderSource

        p = str(tmp_path / "a.jpg")
        Image.fromarray(np.full((16, 16, 3), 90, np.uint8)).save(p)
        inner = ImageFolderSource(paths=[p], targets=np.zeros((1, 1)),
                                  image_size=16)
        src = CachedImageSource(inner, cache_path=str(tmp_path / "cache.npy"))
        out = src.get_batch(np.array([0]))
        assert out["image"].shape == (1, 16, 16, 3)
        assert os.path.exists(tmp_path / "cache.npy")


class TestNativeDecoderSource:
    def test_native_matches_shape_and_content(self, tmp_path):
        from PIL import Image
        from geovpr.data.pipeline import ImageFolderSource

        rng = np.random.default_rng(1)
        p = str(tmp_path / "x.jpg")
        arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(arr).save(p, quality=95)
        pil = ImageFolderSource(paths=[p], targets=np.zeros((1, 1)),
                                image_size=16).get_batch(np.array([0]))
        nat = ImageFolderSource(paths=[p], targets=np.zeros((1, 1)),
                                image_size=16,
                                decoder="native").get_batch(np.array([0]))
        assert nat["image"].shape == pil["image"].shape
        # different resize filters, same underlying image
        diff = np.abs(nat["image"].astype(int) - pil["image"].astype(int))
        assert diff.mean() < 30


class TestCenterCropEval:
    def test_resize_then_center_crop(self, tmp_path):
        """Resize(short->256)+CenterCrop(224) parity with the reference's
        EfficientNet eval transform (validation_script.py:124-129), checked
        against torchvision on the same image."""
        from PIL import Image
        from geovpr.data.pipeline import ImageFolderSource

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)
        p = str(tmp_path / "wide.png")   # png: lossless, exact comparison
        Image.fromarray(arr).save(p)

        src = ImageFolderSource(paths=[p], targets=np.zeros((1, 1)),
                                image_size=224, resize_to=256)
        got = src.get_batch(np.array([0]))["image"][0]

        # hand-built reference (torchvision Resize keeps aspect: short
        # side -> 256, so 300x400 -> 256x341(round) -> center 224x224)
        img = Image.fromarray(arr).resize((341, 256), Image.BILINEAR)
        left, top = (341 - 224) // 2, (256 - 224) // 2
        ref = np.asarray(img.crop((left, top, left + 224, top + 224)),
                         np.uint8)
        assert got.shape == ref.shape == (224, 224, 3)
        np.testing.assert_array_equal(got, ref)


class TestDecodeFallback:
    def test_corrupt_file_yields_dummy(self, tmp_path):
        from geovpr.data.pipeline import ImageFolderSource
        p = str(tmp_path / "broken.jpg")
        with open(p, "wb") as f:
            f.write(b"not a jpeg at all")
        src = ImageFolderSource(paths=[p], targets=np.zeros((1, 1)),
                                image_size=8)
        out = src.get_batch(np.array([0]))
        assert out["image"].shape == (1, 8, 8, 3)
        assert (out["image"] == 0).all()


class TestDualGeometrySource:
    def test_alt_view_matches_reference_eval_transform(self, tmp_path):
        """image_alt must be BIT-EQUAL to the single-stream eval path
        (ImageFolderSource resize_to short-side+center-crop) on non-square
        photos — the geometry cli/evaluate scores with."""
        from PIL import Image
        from geovpr.data.pipeline import DualGeometrySource, ImageFolderSource

        rng = np.random.default_rng(0)
        paths = []
        for i, (h, w) in enumerate([(60, 100), (100, 60), (64, 64)]):
            p = tmp_path / f"img_{i}.jpg"
            yy, xx = np.mgrid[0:h, 0:w]
            ch = ((yy * 2.0 + xx * 1.5 + i * 30) % 255).astype(np.uint8)
            Image.fromarray(np.stack([ch, 255 - ch, ch // 2], -1)).save(
                p, quality=95)
            paths.append(str(p))
        targets = np.zeros((3, 1), np.float32)

        dual = DualGeometrySource(paths=paths, targets=targets,
                                  stream_size=48, alt_size=28,
                                  alt_resize_to=32)
        ref = ImageFolderSource(paths=paths, targets=targets, image_size=28,
                                resize_to=32)
        square_ref = ImageFolderSource(paths=paths, targets=targets,
                                       image_size=48)
        b = dual.get_batch(np.arange(3))
        assert b["image"].shape == (3, 48, 48, 3)
        assert b["image_alt"].shape == (3, 28, 28, 3)
        np.testing.assert_array_equal(
            b["image_alt"], ref.get_batch(np.arange(3))["image"])
        np.testing.assert_array_equal(
            b["image"], square_ref.get_batch(np.arange(3))["image"])

    def test_decode_failure_yields_black_frames(self, tmp_path):
        from geovpr.data.pipeline import DualGeometrySource
        p = tmp_path / "bad.jpg"
        p.write_bytes(b"not a jpeg")
        src = DualGeometrySource(paths=[str(p)],
                                 targets=np.zeros((1, 1), np.float32),
                                 stream_size=32, alt_size=28,
                                 alt_resize_to=32)
        b = src.get_batch(np.array([0]))
        assert (b["image"] == 0).all() and (b["image_alt"] == 0).all()

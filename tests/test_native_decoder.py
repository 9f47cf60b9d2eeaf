"""Native (C++/libjpeg) batch decoder tests, with PIL as oracle."""

import io

import numpy as np
import pytest
from PIL import Image

from geovpr.data.decoder import (
    _decode_batch_pil,
    decode_batch,
    decode_files,
    native_available,
)


def _jpeg_bytes(arr, quality=95):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality)
    return b.getvalue()


@pytest.fixture(scope="module")
def smooth_jpegs():
    yy, xx = np.mgrid[0:300, 0:400]
    bufs = []
    for i in range(6):
        ch = ((yy * 0.4 + xx * 0.3 + i * 11) % 255).astype(np.uint8)
        bufs.append(_jpeg_bytes(np.stack([ch, ch // 2, 255 - ch], -1)))
    return bufs


def test_decode_shapes_and_ok(smooth_jpegs):
    imgs, ok = decode_batch(smooth_jpegs, 224, 224)
    assert imgs.shape == (6, 224, 224, 3)
    assert ok.all()


def test_corrupt_input_zeroed(smooth_jpegs):
    bufs = smooth_jpegs[:2] + [b"corrupt bytes", b""]
    imgs, ok = decode_batch(bufs, 64, 64)
    assert list(ok) == [True, True, False, False]
    assert imgs[2].max() == 0 and imgs[3].max() == 0


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_close_to_pil(smooth_jpegs):
    """Native resize is pure bilinear; PIL's is antialiased — on smooth
    images they must agree closely (decode itself is exact per spec)."""
    native, _ = decode_batch(smooth_jpegs, 224, 224)
    pil, _ = _decode_batch_pil(smooth_jpegs, 224, 224)
    diff = np.abs(native.astype(int) - pil.astype(int)).mean()
    assert diff < 3.0, f"mean abs diff {diff}"


def test_decode_files(tmp_path, smooth_jpegs):
    paths = []
    for i, buf in enumerate(smooth_jpegs[:3]):
        p = tmp_path / f"img_{i}.jpg"
        p.write_bytes(buf)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.jpg"))
    imgs, ok = decode_files(paths, 128, 128)
    assert imgs.shape == (4, 128, 128, 3)
    assert list(ok) == [True, True, True, False]


def test_identity_resize_exact():
    """Same-size decode must match PIL exactly (no resampling involved)."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    buf = _jpeg_bytes(arr, quality=100)
    native, _ = decode_batch([buf], 96, 96)
    pil, _ = _decode_batch_pil([buf], 96, 96)
    if native_available():
        np.testing.assert_array_equal(native, pil)


class TestNativeResizeCrop:
    def test_short_side_resize_center_crop_matches_pil(self, tmp_path):
        """resize_short path (EfficientNet eval transform on the native
        decoder): short side -> 32 keeping aspect, center-crop 28, compared
        against the PIL reference implementation pixel-wise."""
        import io
        from PIL import Image
        from geovpr.data.decoder import (
            _decode_batch_pil,
            decode_batch,
            native_available,
        )

        if not native_available():
            pytest.skip("native decoder unavailable")
        bufs = []
        # smooth gradients (like the square-resize oracle above): native is
        # 2-tap bilinear, PIL is antialiased — on noise they diverge by
        # design, on smooth content they must agree
        for (h, w) in [(48, 64), (64, 48), (40, 40), (37, 55)]:
            yy, xx = np.mgrid[0:h, 0:w]
            ch = ((yy * 2.1 + xx * 1.7) % 255).astype(np.uint8)
            arr = np.stack([ch, ch // 2, 255 - ch], -1)
            b = io.BytesIO()
            Image.fromarray(arr).save(b, format="JPEG", quality=95)
            bufs.append(b.getvalue())

        native, ok_n = decode_batch(bufs, 28, 28, resize_short=32)
        pil, ok_p = _decode_batch_pil(bufs, 28, 28, resize_short=32)
        assert ok_n.all() and ok_p.all()
        assert native.shape == (4, 28, 28, 3)
        # same geometry; interpolation differs by at most a few levels
        diff = np.abs(native.astype(np.int16) - pil.astype(np.int16))
        assert float(diff.mean()) < 4.0, float(diff.mean())
        assert np.mean(diff <= 12) > 0.98

    def test_crop_larger_than_resized_fails_cleanly(self):
        import io
        from PIL import Image
        from geovpr.data.decoder import decode_batch, native_available

        if not native_available():
            pytest.skip("native decoder unavailable")
        arr = np.zeros((40, 60, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="JPEG")
        out, ok = decode_batch([b.getvalue()], 64, 64, resize_short=32)
        assert not ok[0]
        assert (out[0] == 0).all()

    def test_source_native_path_with_resize_to(self, tmp_path):
        """ImageFolderSource(decoder='native', resize_to=...) now uses the
        native crop path (round 1 silently fell back to PIL)."""
        from PIL import Image
        from geovpr.data.pipeline import ImageFolderSource
        from geovpr.data.decoder import native_available

        if not native_available():
            pytest.skip("native decoder unavailable")
        paths = []
        yy, xx = np.mgrid[0:50, 0:70]
        for i in range(3):
            p = tmp_path / f"img_{i}.jpg"
            ch = ((yy * 1.9 + xx * 1.3 + i * 40) % 255).astype(np.uint8)
            Image.fromarray(np.stack([ch, 255 - ch, ch // 2], -1)).save(p)
            paths.append(str(p))
        src_native = ImageFolderSource(paths=paths,
                                       targets=np.zeros((3, 1), np.float32),
                                       image_size=28, decoder="native",
                                       resize_to=32)
        src_pil = ImageFolderSource(paths=paths,
                                    targets=np.zeros((3, 1), np.float32),
                                    image_size=28, decoder="pil",
                                    resize_to=32)
        a = src_native.get_batch(np.arange(3))["image"]
        b = src_pil.get_batch(np.arange(3))["image"]
        assert a.shape == b.shape == (3, 28, 28, 3)
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert float(diff.mean()) < 4.0

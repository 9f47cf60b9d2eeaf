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

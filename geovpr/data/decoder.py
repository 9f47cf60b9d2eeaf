"""Native JPEG batch decoder (ctypes binding to native/libgeovpr_decoder.so).

Host-side replacement for PIL in the input pipeline: C++ libjpeg decode +
bilinear resize with an internal thread pool (`native/decoder.cpp`). Falls
back to PIL transparently when the shared library isn't built (it
auto-builds via `make` on first use when a toolchain is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgeovpr_decoder.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False
_load_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted, _load_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            if _build_attempted:
                _load_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            fn = lib.geovpr_decode_batch_ex
        except AttributeError:
            # a stale .so from before the resize_short extension: rebuild —
            # at most ONCE (same guard as the missing-.so branch; without it
            # a toolchain-less host would re-spawn a failing `make` on every
            # batch instead of falling back to PIL once)
            if _build_attempted:
                _load_failed = True
                return None
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                               capture_output=True, timeout=120)
                lib = ctypes.CDLL(_LIB_PATH)
                fn = lib.geovpr_decode_batch_ex
            except Exception:
                _load_failed = True
                return None
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # blob
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.c_int,                     # n
            ctypes.c_int, ctypes.c_int,       # out_h, out_w
            ctypes.c_int,                     # resize_short (0 = square)
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.POINTER(ctypes.c_uint8),   # ok
            ctypes.c_int,                     # threads
        ]
        lib.geovpr_decoder_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def decode_batch(jpeg_buffers: Sequence[bytes], out_h: int, out_w: int,
                 threads: int = 8,
                 resize_short: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of JPEG byte strings.

    Returns (images (N, out_h, out_w, 3) uint8, ok (N,) bool). Failed
    decodes yield zeroed slots with ok=False (the reference's dummy-sample
    fallback semantics, test_script.py:108-114). With `resize_short` > 0,
    each image's short side is resized to it (aspect kept) and the center
    (out_h, out_w) cropped — the EfficientNet eval transform
    Resize(256)+CenterCrop(224), validation_script.py:124-129.
    """
    lib = _load_library()
    if lib is None:
        return _decode_batch_pil(jpeg_buffers, out_h, out_w, resize_short)

    n = len(jpeg_buffers)
    offsets = np.zeros(n + 1, np.int64)
    for i, buf in enumerate(jpeg_buffers):
        offsets[i + 1] = offsets[i] + len(buf)
    blob = np.frombuffer(b"".join(jpeg_buffers), np.uint8)
    if blob.size == 0:
        blob = np.zeros(1, np.uint8)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)

    lib.geovpr_decode_batch_ex(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out_h, out_w, resize_short,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads)
    return out, ok.astype(bool)


def _decode_batch_pil(jpeg_buffers, out_h, out_w, resize_short=0):
    import io

    from PIL import Image

    n = len(jpeg_buffers)
    out = np.zeros((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, bool)
    for i, buf in enumerate(jpeg_buffers):
        try:
            with Image.open(io.BytesIO(buf)) as img:
                img = img.convert("RGB")
                if resize_short:
                    w, h = img.size
                    short = min(w, h)
                    nw = round(w * resize_short / short)
                    nh = round(h * resize_short / short)
                    img = img.resize((nw, nh), Image.BILINEAR)
                    left = (nw - out_w) // 2
                    top = (nh - out_h) // 2
                    img = img.crop((left, top, left + out_w, top + out_h))
                else:
                    img = img.resize((out_w, out_h), Image.BILINEAR)
                out[i] = np.asarray(img, np.uint8)
                ok[i] = True
        except Exception:
            pass
    return out, ok


def decode_files(paths: Sequence[str], out_h: int, out_w: int,
                 threads: int = 8,
                 resize_short: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Read + decode a batch of image files."""
    bufs = []
    for p in paths:
        try:
            with open(p, "rb") as f:
                bufs.append(f.read())
        except OSError:
            bufs.append(b"")
    return decode_batch(bufs, out_h, out_w, threads, resize_short)

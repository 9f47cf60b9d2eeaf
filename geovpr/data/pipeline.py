"""Input pipeline: host decode/batch -> device transforms.

The reference decodes+augments in 4 DataLoader worker processes
(`swin_attempt_2.py:152-153`) and normalizes via the HF processor per
sample. TPU-first split here:

- HOST (this module): JPEG decode (PIL thread pool; `geovpr.data.decoder`
  offers a native libjpeg path), uint8 batching, shuffling, padding to
  static shapes, async device_put prefetch.
- DEVICE (`geovpr.data.transforms`): uint8 -> float, resize, normalize, and
  augmentation inside the jitted step — elementwise work fused by XLA into
  the backbone's first conv instead of burning host cores.

Batches are dicts {"image": (B,H,W,3) uint8, "target": (B,T) f32,
"mask": (B,) bool} with static B (final partial batch padded; padded rows
masked out of losses/metrics — the reference instead drops or special-cases
them, e.g. the None-filtering collate at val_and_test_swin_2.py:179-195).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
from typing import Iterator, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ArraySource:
    """In-memory image source (synthetic data, tests, pre-decoded shards)."""

    images: np.ndarray          # (N, H, W, 3) uint8
    targets: np.ndarray         # (N, T) float32
    filenames: Optional[list[str]] = None

    def __len__(self):
        return self.images.shape[0]

    def get_batch(self, idx: np.ndarray) -> dict:
        return {"image": self.images[idx], "target": self.targets[idx]}


@dataclasses.dataclass
class ImageFolderSource:
    """Disk-backed source: decodes JPEG/PNG with a thread pool at batch-fetch
    time. Images are resized to `image_size` on the host (PIL bilinear, the
    same default the HF processors the reference relies on use)."""

    paths: Sequence[str]
    targets: np.ndarray
    image_size: int = 224
    num_threads: int = 8
    filenames: Optional[list[str]] = None
    # "pil" (default, matches the HF-processor bilinear resize the reference
    # relies on) or "native" (C++ libjpeg decoder, geovpr/data/decoder.py —
    # measured 2.7x faster per core at 480p->224 via DCT-scaled decode;
    # falls back to PIL per-file on failure)
    decoder: str = "pil"
    # resize the short side to `resize_to` then center-crop `image_size` —
    # the reference's EfficientNet eval transform Resize(256)+CenterCrop(224)
    # (angle_prediction/efficient_net/validation_script.py:124-129). 0 means
    # plain square resize to image_size (every other reference script).
    resize_to: int = 0

    def __post_init__(self):
        self._pool = concurrent.futures.ThreadPoolExecutor(self.num_threads)

    def __len__(self):
        return len(self.paths)

    def _decode(self, path: str) -> np.ndarray:
        try:
            return self._decode_inner(path)
        except Exception:
            # unreadable/corrupt file mid-run -> black dummy frame, matching
            # the reference's fallback (test_script.py:108-114); manifest
            # screening catches these up front when enabled
            return np.zeros((self.image_size, self.image_size, 3), np.uint8)

    def _decode_inner(self, path: str) -> np.ndarray:
        from PIL import Image
        with Image.open(path) as img:
            img = img.convert("RGB")
            if self.resize_to:
                w, h = img.size
                short = min(w, h)
                nw, nh = (round(w * self.resize_to / short),
                          round(h * self.resize_to / short))
                img = img.resize((nw, nh), Image.BILINEAR)
                left = (nw - self.image_size) // 2
                top = (nh - self.image_size) // 2
                img = img.crop((left, top, left + self.image_size,
                                top + self.image_size))
            else:
                img = img.resize((self.image_size, self.image_size),
                                 Image.BILINEAR)
            return np.asarray(img, np.uint8)

    def get_batch(self, idx: np.ndarray) -> dict:
        batch_paths = [self.paths[i] for i in idx]
        if self.decoder == "native":
            from geovpr.data.decoder import decode_files
            imgs, ok = decode_files(batch_paths, self.image_size,
                                    self.image_size,
                                    threads=self.num_threads,
                                    resize_short=self.resize_to)
            if not ok.all():
                # per-file PIL fallback for anything libjpeg rejected
                for j in np.flatnonzero(~ok):
                    imgs[j] = self._decode(batch_paths[j])
            return {"image": imgs, "target": self.targets[idx]}
        imgs = list(self._pool.map(self._decode, batch_paths))
        return {"image": np.stack(imgs), "target": self.targets[idx]}


@dataclasses.dataclass
class DualGeometrySource:
    """One JPEG decode, two geometries per image.

    Emits batches with BOTH a square `image` stream (stream_size, the HF
    processors' aspect-squashing resize every geopose head trained on) and
    an `image_alt` short-side-resize(alt_resize_to)+center-crop(alt_size)
    view — the EXACT EfficientNet eval transform
    (validation_script.py:124-129). Built for fused pipelines whose heads
    disagree on input geometry (cli/fuse.py): a square-then-device-crop
    approximation would silently change the angle head's field of view on
    every non-square photo, while decoding twice would double host cost.
    """

    paths: Sequence[str]
    targets: np.ndarray
    stream_size: int
    alt_size: int
    alt_resize_to: int
    num_threads: int = 8
    filenames: Optional[list[str]] = None

    def __post_init__(self):
        self._pool = concurrent.futures.ThreadPoolExecutor(self.num_threads)
        self.image_size = self.stream_size

    def __len__(self):
        return len(self.paths)

    def _decode(self, path: str):
        from PIL import Image
        try:
            with Image.open(path) as img:
                img = img.convert("RGB")
                square = np.asarray(
                    img.resize((self.stream_size, self.stream_size),
                               Image.BILINEAR), np.uint8)
                w, h = img.size
                short = min(w, h)
                nw = round(w * self.alt_resize_to / short)
                nh = round(h * self.alt_resize_to / short)
                resized = img.resize((nw, nh), Image.BILINEAR)
                left = (nw - self.alt_size) // 2
                top = (nh - self.alt_size) // 2
                alt = np.asarray(
                    resized.crop((left, top, left + self.alt_size,
                                  top + self.alt_size)), np.uint8)
                return square, alt
        except Exception:
            # decode-failure fallback: black frames, matching the reference
            # (test_script.py:108-114)
            return (np.zeros((self.stream_size, self.stream_size, 3),
                             np.uint8),
                    np.zeros((self.alt_size, self.alt_size, 3), np.uint8))

    def get_batch(self, idx: np.ndarray) -> dict:
        pairs = list(self._pool.map(self._decode,
                                    [self.paths[i] for i in idx]))
        return {"image": np.stack([p[0] for p in pairs]),
                "image_alt": np.stack([p[1] for p in pairs]),
                "target": self.targets[idx]}


@dataclasses.dataclass
class CachedImageSource:
    """Caches decoded+resized uint8 images from an inner source.

    First touch of a row pays the JPEG decode; every later epoch reads the
    cached array (RAM, or a disk memmap via `cache_path` for datasets larger
    than memory). At >2k img/s/chip device throughput, host JPEG decode is
    the input-pipeline bottleneck (SURVEY.md §7 "hard parts") — after epoch
    0 this removes it entirely.
    """

    inner: object
    cache_path: str = ""   # "" => RAM; else .npy memmap on disk

    def __post_init__(self):
        n = len(self.inner)
        s = self.inner.image_size
        shape = (n, s, s, 3)
        if self.cache_path:
            self._cache = np.lib.format.open_memmap(
                self.cache_path, mode="w+", dtype=np.uint8, shape=shape)
        else:
            self._cache = np.zeros(shape, np.uint8)
        self._have = np.zeros(n, bool)
        self.filenames = getattr(self.inner, "filenames", None)
        self.targets = self.inner.targets
        self.image_size = s

    def __len__(self):
        return len(self.inner)

    def get_batch(self, idx: np.ndarray) -> dict:
        missing = np.unique(idx[~self._have[idx]])
        if missing.size:
            decoded = self.inner.get_batch(missing)
            self._cache[missing] = decoded["image"]
            # an all-black frame is the decode-failure sentinel — leave it
            # uncached so a transient I/O error is retried next epoch rather
            # than poisoning every later epoch
            ok = decoded["image"].reshape(len(missing), -1).any(axis=1)
            self._have[missing] = ok
        return {"image": self._cache[idx], "target": self.targets[idx]}


def iterate_batches(
    source,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_remainder: bool = False,
) -> Iterator[dict]:
    """Yield static-shape batches with a validity mask."""
    n = len(source)
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed + epoch)
        rng.shuffle(order)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for start in range(0, stop, batch_size):
        idx = order[start:start + batch_size]
        valid = idx.shape[0]
        if valid < batch_size:  # pad final batch to static shape
            idx = np.concatenate([idx, np.repeat(idx[-1:], batch_size - valid)])
        batch = source.get_batch(idx)
        batch["mask"] = np.arange(batch_size) < valid
        batch["_indices"] = idx[:valid]
        yield batch


def prefetch_to_device(iterator, mesh=None, depth: int = 2):
    """Overlap host batch assembly with device compute: device_put each
    batch (sharded over the mesh when given) while the previous one is
    still being consumed."""
    import collections

    import jax

    from geovpr.parallel import shard_batch
    from geovpr.parallel.mesh import pad_batch_to_multiple

    queue = collections.deque()

    def _put(batch):
        host = {k: v for k, v in batch.items() if not k.startswith("_")}
        extras = {k: v for k, v in batch.items() if k.startswith("_")}
        if mesh is not None:
            # batch rows must divide the data axis; pad the tail (masked
            # rows are excluded from losses/metrics downstream)
            n_shards = (mesh.shape.get("data", 1)
                        if hasattr(mesh.shape, "get") else mesh.devices.size)
            n = next(iter(host.values())).shape[0]
            if n % n_shards != 0:
                old_mask = host.get("mask")
                host, pad_mask = pad_batch_to_multiple(host, n_shards)
                host["mask"] = (np.logical_and(host["mask"], pad_mask)
                                if old_mask is not None else pad_mask)
            dev = shard_batch(mesh, host)
        else:
            dev = jax.tree_util.tree_map(jax.device_put, host)
        dev.update(extras)
        return dev

    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

r"""Fused end-to-end inference pipeline.

Replaces the reference's missing `final_csv_generators/` stage (README.md:12
documents it; the directory is absent from the snapshot — SURVEY.md §0).
Its outputs are known: merged, sorted final CSVs combining geopose and angle
predictions (`test_predictions_sorted.csv`, `test_pred.csv`).

Here the whole chain runs batched on device in ONE jitted function per
batch — descriptor extraction + retrieval against a reference index, geopose
regression, and angle regression share the input batch; the host only sees
final arrays:

    images -> normalize ---> DINOv2+SALAD -> descriptors -> top-k matches
                        \--> Swin-B      -> (lat, lon)
                        \--> angle net   -> heading

plus `export_fused_csvs` writing the combined submission files.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geovpr.data.pipeline import iterate_batches, prefetch_to_device
from geovpr.data.transforms import normalize
from geovpr.pipeline.export import (
    write_angle_test_csv,
    write_geopose_test_csv,
    write_retrieval_matches_csv,
)
from geovpr.retrieval.index import DescriptorIndex


@dataclasses.dataclass
class FusedPipeline:
    """Bundle of the three inference heads over one image stream.

    Each component is (model, variables, postprocess). Any component may be
    None — the pipeline emits only what it has (the reference likewise ran
    geopose and angle exports from separate scripts)."""

    geopose_model: Any = None
    geopose_variables: Any = None
    geopose_scaler: Any = None
    angle_model: Any = None
    angle_variables: Any = None
    angle_codec: Any = None          # None => direct degrees head
    descriptor_model: Any = None
    descriptor_variables: Any = None
    index: Optional[DescriptorIndex] = None
    # filenames of the index rows, for retrieval_matches.csv export
    gallery_filenames: Optional[list] = None
    top_k: int = 5
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)
    # 64 is the measured latency point (one v5e: 855.6 img/s exact /
    # 947.0 with index.topk_method="approx"); 128 is the throughput knee
    # under the approx serving index (992.9 img/s; B=256 +1% at 2x
    # latency — benches/FUSE_APPROX_r05.log)
    batch_size: int = 64
    mesh: Any = None
    # per-head input resolutions: the ONE decoded stream arrives at the max
    # of these and each head gets a device-side bilinear resize (0 = take
    # the stream as-is). The heads the reference fused ran at different
    # resolutions (Swin-B 384, EfficientNet 224) from separate decode
    # passes; here the decode happens once.
    geopose_size: int = 0
    angle_size: int = 0
    descriptor_size: int = 0
    # device analog of the EfficientNet eval transform Resize(256)+
    # CenterCrop(224) (validation_script.py:124-129): resize the (square)
    # stream to this size, then center-crop angle_size
    angle_resize_to: int = 0

    def __post_init__(self):
        self._step = jax.jit(self._forward)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _resize_matrix(src: int, dst: int) -> np.ndarray:
        """Exact (dst, src) row-interpolation matrix of
        jax.image.resize(..., "bilinear"): resize is linear and separable,
        so resizing the identity yields its per-axis weights (including the
        antialias triangle widening on downscale). Cached as numpy so it
        bakes into the jitted program as a small constant."""
        eye = np.eye(src, dtype=np.float32)
        # first call may happen inside a jit trace — force eager evaluation
        # (otherwise resize returns a tracer and np.asarray throws)
        with jax.ensure_compile_time_eval():
            return np.asarray(jax.image.resize(eye, (dst, src), "bilinear"))

    @classmethod
    def _resize_for_head(cls, x: jax.Array, size: int, resize_to: int = 0):
        """Static-shape device resize of the shared (square) stream for one
        head, as two separable matmuls on the MXU — measured 4.43 -> 1.81
        ms/batch at (64, 384->224, f32) vs jax.image.resize's gather
        lowering, identical weights (docs/DESIGN.md, round 4). With
        `resize_to` (the Resize(256)+CenterCrop(size) eval geometry,
        validation_script.py:124-129) the crop is FOLDED into the weight
        slice: rows [off:off+size] of the (resize_to, s) matrix — exact by
        linearity, and the resize_to^2 intermediate never materializes."""
        s = x.shape[1]
        if resize_to and size:
            if resize_to == s:
                off = (resize_to - size) // 2
                return x[:, off:off + size, off:off + size, :]
            w = cls._resize_matrix(s, resize_to)
            off = (resize_to - size) // 2
            w = jnp.asarray(w[off:off + size])          # (size, s)
        elif size and size != s:
            w = jnp.asarray(cls._resize_matrix(s, size))
        else:
            return x
        w = w.astype(x.dtype)
        y = jnp.einsum("th,bhwc->btwc", w, x)
        return jnp.einsum("tw,bhwc->bhtc", w, y)

    def _head_input(self, x_scaled, size: int, resize_to: int = 0):
        """One head's normalized input from the shared [0,1]-scaled raw
        stream: RESIZE FIRST, then the per-channel affine (x - mean)/std.
        Normalize is affine and the bilinear resize rows sum to 1
        (partition of unity), so the two commute exactly up to float
        rounding — and resize-first means (a) the downsizing einsums read
        the raw stream directly (no normalized full-resolution tensor
        materialized for them), and (b) XLA fuses the affine into the
        second resize matmul's epilogue, making per-head normalize free.
        Measured round 5 (benches/FUSE_NORMFOLD_r05.log) vs the round-4
        normalize-at-stream-resolution scheme flagged in VERDICT r4."""
        y = self._resize_for_head(x_scaled, size, resize_to)
        return normalize(y, self.mean, self.std)

    def _forward(self, geo_v, ang_v, desc_v, images, images_alt=None):
        # variables are traced ARGUMENTS — closing over them would bake
        # every weight into the executable as XLA constants (compile time
        # and HBM roughly double, and swapping variables becomes a no-op)
        x = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            x = x / 255.0
        out = {}
        if self.geopose_model is not None:
            preds = self.geopose_model.apply(
                geo_v, self._head_input(x, self.geopose_size),
                train=False, deterministic=True)
            if self.geopose_scaler is not None:
                preds = self.geopose_scaler.inverse_transform(preds)
            out["latlon"] = preds
        if self.angle_model is not None:
            if images_alt is not None:
                # a second host-side geometry (DualGeometrySource): the
                # exact short-side+crop eval view — use it verbatim
                ang_x = normalize(images_alt, self.mean, self.std)
            else:
                ang_x = self._head_input(x, self.angle_size,
                                         self.angle_resize_to)
            raw = self.angle_model.apply(
                ang_v, ang_x,
                train=False, deterministic=True)
            if self.angle_codec is not None:
                out["angle"] = self.angle_codec.decode(raw)
            else:
                out["angle"] = jnp.mod(raw[..., 0], 360.0)
        if self.descriptor_model is not None:
            out["descriptor"] = self.descriptor_model.apply(
                desc_v, self._head_input(x, self.descriptor_size),
                train=False, deterministic=True).pooled
        return out

    def run(self, source) -> dict[str, np.ndarray]:
        """Run every component over `source`; returns dense arrays in source
        order (+ retrieval results when an index is attached)."""
        n = len(source)
        results: dict[str, np.ndarray] = {}
        for batch in prefetch_to_device(
                iterate_batches(source, self.batch_size), self.mesh):
            idx = batch.pop("_indices")
            out = self._step(self.geopose_variables, self.angle_variables,
                             self.descriptor_variables, batch["image"],
                             batch.get("image_alt"))
            for key, val in out.items():
                val = np.asarray(val)[:len(idx)]
                if key not in results:
                    results[key] = np.zeros((n,) + val.shape[1:], val.dtype)
                results[key][idx] = val
        if self.index is not None and "descriptor" in results:
            scores, nbrs = self.index.search(
                jnp.asarray(results["descriptor"]), k=self.top_k)
            results["retrieval_scores"] = np.asarray(scores)
            results["retrieval_indices"] = np.asarray(nbrs)
        return results

    def export(self, source, out_dir: str,
               filenames: Optional[list[str]] = None) -> dict[str, str]:
        """Run + write the final submission CSVs (sorted by filename, the
        missing final_csv_generators contract)."""
        os.makedirs(out_dir, exist_ok=True)
        names = filenames or source.filenames
        results = self.run(source)
        written = {}
        if "latlon" in results:
            path = os.path.join(out_dir, "test_predictions_sorted.csv")
            write_geopose_test_csv(path, names, results["latlon"])
            written["geopose"] = path
        if "angle" in results:
            path = os.path.join(out_dir, "test_pred.csv")
            write_angle_test_csv(path, names, results["angle"])
            written["angle"] = path
        if "retrieval_indices" in results:
            path = os.path.join(out_dir, "retrieval_matches.csv")
            write_retrieval_matches_csv(
                path, names, self.gallery_filenames,
                results["retrieval_indices"], results["retrieval_scores"])
            written["retrieval"] = path
        return written

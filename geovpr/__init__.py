"""geovpr — TPU-native visual place recognition + geopose estimation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
repo `anshium/visual-place-recognition-and-geopose-estimation` (22 single-GPU
PyTorch research scripts), re-architected as one coherent TPU-first stack:

- ``geovpr.core``       config dataclasses, PRNG plumbing, dtype policy
- ``geovpr.parallel``   device mesh / sharding setup (DP + TP over ICI)
- ``geovpr.data``       CSV manifest loading, host decode pool, device prefetch
- ``geovpr.objectives`` losses (MSE/Huber/MAAE/acos-angular/competition),
                        angle sin-cos codecs, StandardScaler target codec
- ``geovpr.models``     Swin-T/B, DINOv2 ViT-B/14, EfficientNet-B0, ConvNeXt-B
                        (flax.linen, NHWC) + SALAD aggregation head
- ``geovpr.heads``      regression heads (linear / MLP / sincos / descriptor)
- ``geovpr.ops``        Pallas TPU kernels (windowed attention, Sinkhorn,
                        fused normalize, top-k) with XLA fallbacks
- ``geovpr.train``      pjit train/eval loops, checkpointing, schedules
- ``geovpr.retrieval``  HBM-resident cosine top-k descriptor index, Recall@k
- ``geovpr.pipeline``   fused retrieval+geopose+angle export to final CSVs
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache, opt-in via GEOVPR_COMPILE_CACHE=<dir>.
# Every serving CLI (evaluate/retrieve/fuse) and library consumer pays a
# 20-40 s XLA compile per fresh process for the flagship programs; with the
# cache the second process loads the serialized executable in well under a
# second (verified through the remote-TPU tunnel, where PJRT compilation is
# client-initiated and the cache therefore works unchanged). Env-gated here
# in the package root so one knob covers every entry point; unset means
# zero overhead and stock JAX behavior. JAX's own thresholds
# (jax_persistent_cache_min_compile_time_secs = 1.0) keep trivial programs
# out of the cache.
if _os.environ.get("GEOVPR_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.abspath(_os.path.expanduser(
            _os.environ["GEOVPR_COMPILE_CACHE"])))

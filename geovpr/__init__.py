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

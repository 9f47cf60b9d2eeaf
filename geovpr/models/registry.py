"""Backbone registry: ModelConfig -> flax module."""

from __future__ import annotations

import jax.numpy as jnp

from geovpr.core.config import ModelConfig


def supports_int8(family: str) -> bool:
    """Families with a w8a8 serving path (quantized MLPs; attention
    projections too for the ViTs). ConvNeXt quantizes its channel MLPs —
    ~96% of its FLOPs — via the same fused kernel (models/convnext.py).
    EfficientNet has no quantized path: it is bandwidth-bound at ~5% MFU
    (docs/DESIGN.md "Conv families") and BN-based, so cheaper matmul math
    buys nothing."""
    return family in ("swin", "dinov2", "dinov2_salad", "convnext")


def build_backbone(cfg: ModelConfig, dtype=jnp.float32, *,
                   int8: bool = False, calibrate: bool = False):
    family = cfg.family
    if (int8 or calibrate) and not supports_int8(family):
        raise ValueError(
            f"family {family!r} has no int8 serving path "
            "(supported: swin, dinov2, dinov2_salad, convnext)")
    if family == "efficientnet":
        from geovpr.models.efficientnet import EfficientNetB0
        if cfg.variant not in ("b0",):
            raise ValueError(f"unknown efficientnet variant {cfg.variant!r}")
        return EfficientNetB0(dtype=dtype)
    if family == "swin":
        from geovpr.models.swin import SwinTransformer, SWIN_VARIANTS
        if cfg.variant not in SWIN_VARIANTS:
            raise ValueError(f"unknown swin variant {cfg.variant!r}")
        spec = SWIN_VARIANTS[cfg.variant]
        if cfg.image_size and cfg.image_size != spec["image_size"]:
            raise ValueError(
                f"swin variant {cfg.variant!r} is fixed at "
                f"{spec['image_size']}px (window partitioning); got "
                f"image_size={cfg.image_size}")
        return SwinTransformer(**spec, dtype=dtype,
                               use_pallas=cfg.use_pallas, remat=cfg.remat,
                               int8_mlp=int8, int8_attn=int8,
                               calibrate=calibrate)
    if family == "dinov2":
        from geovpr.models.dinov2 import DinoV2, DINOV2_VARIANTS
        if cfg.variant not in DINOV2_VARIANTS:
            raise ValueError(f"unknown dinov2 variant {cfg.variant!r}")
        return DinoV2(**DINOV2_VARIANTS[cfg.variant], dtype=dtype,
                      image_size=cfg.image_size or 224,
                      use_pallas=cfg.use_pallas, remat=cfg.remat,
                      int8_mlp=int8, int8_attn=int8, calibrate=calibrate)
    if family == "dinov2_salad":
        from geovpr.models.dinov2 import DINOV2_VARIANTS
        from geovpr.models.salad import DinoV2Salad
        if cfg.variant not in DINOV2_VARIANTS:
            raise ValueError(f"unknown dinov2_salad variant {cfg.variant!r}")
        return DinoV2Salad(variant=cfg.variant, dtype=dtype,
                           image_size=cfg.image_size or 224,
                           use_pallas=cfg.use_pallas, remat=cfg.remat,
                           int8_mlp=int8, int8_attn=int8,
                           calibrate=calibrate)
    if family == "convnext":
        from geovpr.models.convnext import ConvNeXt, CONVNEXT_VARIANTS
        if cfg.variant not in CONVNEXT_VARIANTS:
            raise ValueError(f"unknown convnext variant {cfg.variant!r}")
        return ConvNeXt(**CONVNEXT_VARIANTS[cfg.variant], dtype=dtype,
                        int8_mlp=int8, calibrate=calibrate)
    raise ValueError(f"unknown model family {family!r}")

"""Backbone + head assembly into one trainable module."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geovpr.core.config import ModelConfig
from geovpr.heads import build_head
from geovpr.models import build_backbone


class RegressionModel(nn.Module):
    """backbone(images) -> pooling -> head -> (B, out_dim).

    `pooling` selects which backbone feature feeds the head:
    - "pooler": BackboneOutput.pooled (the HF-pooler equivalent — mean of
      tokens for Swin/ConvNeXt/EfficientNet, CLS for DINOv2)
    - "mean": f32 mean over the FULL last_hidden_state (CLS + patches for
      ViTs) — the reference's `.mean(dim=1)` recipes
      (swin_attempt_3.py:164-170, dinov2salad_finetuning_2.py:127); for
      Swin this equals "pooler", for DINOv2 it does not
    - "cls": CLS token (DINOv2 angle heads, dino_angle_finetuning.py:45)

    `freeze_backbone` reproduces the frozen-descriptor path
    (dinov2salad_finetuning.py:25-26): a stop_gradient on the features (the
    optimizer factory additionally zeroes backbone updates).
    """

    config: ModelConfig
    # None => config.compute_dtype on TPU (bf16: MXU-native, measured +24%
    # on Swin-B-384), float32 elsewhere (CPU bf16 is software-emulated and
    # an order of magnitude slower)
    dtype: object = None
    # w8a8 serving path / its calibration pass (models/quantize.py) —
    # serving-time clones only; training always runs with both off. The
    # names match the backbone flags so quantize_for_serving's clone()
    # machinery works on the wrapped model too.
    int8_mlp: bool = False
    calibrate: bool = False

    def setup(self):
        if self.dtype is not None:
            dtype = self.dtype
        elif jax.default_backend() == "tpu":
            dtype = jnp.dtype(self.config.compute_dtype)
        else:
            dtype = jnp.float32
        self.backbone = build_backbone(self.config, dtype=dtype,
                                       int8=self.int8_mlp,
                                       calibrate=self.calibrate)
        self.head = build_head(
            self.config.head, out_dim=self.config.out_dim,
            hidden=self.config.head_hidden, dropout=self.config.head_dropout,
            dtype=dtype)

    def __call__(self, images: jax.Array, train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        out = self.backbone(images, train=train, deterministic=deterministic)
        feats = self._pool(out)
        if self.config.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return self.head(feats, deterministic=deterministic)

    def _pool(self, out) -> jax.Array:
        if self.config.family == "dinov2_salad":
            # the SALAD descriptor IS the feature for this family
            # (dinov2salad_finetuning.py:34-37 feeds the 8448-d descriptor
            # to the MLP); its `tokens` are raw backbone patch tokens, so
            # mean/cls pooling over them would silently bypass the
            # descriptor while still paying the Sinkhorn head's compute
            return out.pooled
        if self.config.pooling == "cls" and out.cls is not None:
            return out.cls
        if self.config.pooling == "mean" and out.tokens is not None:
            # mean over the FULL last_hidden_state — for ViTs that is CLS +
            # patch tokens (dinov2salad_finetuning_2.py:127 `.mean(dim=1)`;
            # swin_attempt_3.py:164-170). f32 accumulation: a bf16 sum over
            # 257 tokens loses ~2 mantissa bits.
            tok_sum = jnp.sum(out.tokens.astype(jnp.float32), axis=1)
            n = out.tokens.shape[1]
            if out.cls is not None:
                return (tok_sum + out.cls.astype(jnp.float32)) / (n + 1)
            return tok_sum / n
        return out.pooled

    def features(self, images: jax.Array) -> jax.Array:
        """Descriptor/feature extraction path (eval only)."""
        return self.backbone(images, train=False, deterministic=True).pooled

    def pooled_features(self, images: jax.Array) -> jax.Array:
        """Exactly the features the head consumes (backbone + configured
        pooling) — the frozen-feature cache extracts these once per run
        (Trainer._maybe_cache_frozen_features)."""
        return self._pool(
            self.backbone(images, train=False, deterministic=True))

    def head_only(self, feats: jax.Array, train: bool = False,
                  deterministic: bool = True) -> jax.Array:
        """Head forward on precomputed `pooled_features` — the train/eval
        step body when the frozen-feature cache is active."""
        del train
        return self.head(feats, deterministic=deterministic)

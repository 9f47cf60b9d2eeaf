"""Workload objectives: target encoding, loss, decoding, metrics — one named
object per reference training recipe, all pure jnp (usable inside jit).

| Objective            | Reference recipe                                      |
|----------------------|-------------------------------------------------------|
| GeoposeObjective     | scaled lat/lon + MSE (swin_finetuning.py:89) or       |
|                      | Huber (swin_attempt_2.py:158)                         |
| AngleDirectObjective | raw degrees, MAAE as the training loss                |
|                      | (efficientnet_finetuning.py:66-68,111)                |
| AngleSinCosObjective | encoded pair + MSE (en_finetuning_gemini.py:158) or   |
|                      | unit-normalized + acos loss                           |
|                      | (swin_angle_finetuning_sin_cos.py:65-69)              |
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from geovpr.objectives.angle_codec import SinCosCodec, wrap_degrees
from geovpr.objectives.losses import (
    acos_angular_loss_deg,
    angular_error_deg,
    huber_loss,
    maae_deg,
    mse_loss,
)
from geovpr.objectives.losses import geopose_metrics
from geovpr.objectives.scaler import ScalerState


@dataclasses.dataclass(frozen=True)
class GeoposeObjective:
    """(lat, lon) regression with StandardScaler target codec."""

    loss_name: str = "huber"  # huber | mse
    huber_delta: float = 1.0

    out_dim: int = 2

    def encode_targets(self, latlon: jnp.ndarray, scaler: ScalerState):
        return scaler.transform(latlon)

    def loss(self, preds, enc_targets, mask=None):
        if self.loss_name == "huber":
            return huber_loss(preds, enc_targets, self.huber_delta, mask)
        if self.loss_name == "mse":
            return mse_loss(preds, enc_targets, mask)
        raise ValueError(self.loss_name)

    def decode_predictions(self, preds, scaler: ScalerState):
        return scaler.inverse_transform(preds)

    def metrics(self, decoded, raw_targets, mask=None):
        return geopose_metrics(decoded, raw_targets, mask)

    def remap_flip(self, targets, flip):
        # a horizontal image flip does not move the camera: lat/lon unchanged
        return targets

    # which metric drives plateau-LR / early stopping (lower is better)
    monitor = "mse"


@dataclasses.dataclass(frozen=True)
class AngleDirectObjective:
    """Direct scalar-degree regression, circular MAAE as loss.

    Predictions are wrapped `% 360` like the reference
    (`efficientnet_finetuning.py:110`; `dino_angle_finetuning.py:47` wraps
    inside forward)."""

    out_dim: int = 1

    def encode_targets(self, angle_deg: jnp.ndarray, scaler=None):
        return angle_deg.reshape(-1, 1)

    def loss(self, preds, enc_targets, mask=None):
        return maae_deg(wrap_degrees(preds[:, 0]), enc_targets[:, 0], mask)

    def decode_predictions(self, preds, scaler=None):
        return wrap_degrees(preds[:, 0])

    def metrics(self, decoded, raw_targets, mask=None):
        return {"maae": maae_deg(decoded, raw_targets, mask)}

    def remap_flip(self, targets, flip):
        # mirror heading under horizontal flip: theta -> (180 - theta) % 360
        # (swin_angle_finetuning_gemini.py:59-76, done here with the SAME
        # flip decision that transformed the image)
        return jnp.where(flip, jnp.mod(180.0 - targets, 360.0), targets)

    monitor = "maae"


@dataclasses.dataclass(frozen=True)
class AngleSinCosObjective:
    """sin/cos-encoded angle regression.

    loss_name:
      "mse"  — MSE on the encoded pair (en_finetuning_gemini.py:158,192)
      "acos" — unit-normalize prediction, geodesic acos loss in degrees
               (swin_angle_finetuning_sin_cos.py:62-69)
    """

    loss_name: str = "mse"
    codec: SinCosCodec = SinCosCodec("cos_sin")

    out_dim: int = 2

    def encode_targets(self, angle_deg: jnp.ndarray, scaler=None):
        return self.codec.encode(angle_deg)

    def loss(self, preds, enc_targets, mask=None):
        if self.loss_name == "mse":
            return mse_loss(preds, enc_targets, mask)
        if self.loss_name == "acos":
            return acos_angular_loss_deg(self.codec.normalize(preds),
                                         enc_targets, mask)
        raise ValueError(self.loss_name)

    def decode_predictions(self, preds, scaler=None):
        return self.codec.decode(preds)

    def metrics(self, decoded, raw_targets, mask=None):
        return {"maae": maae_deg(decoded, raw_targets, mask)}

    def remap_flip(self, targets, flip):
        return jnp.where(flip, jnp.mod(180.0 - targets, 360.0), targets)

    monitor = "maae"


def per_sample_errors(objective, decoded, raw_targets):
    """Per-image error column for CSV export parity
    (validation_swin_2.py:205-218 writes error_latitude/error_longitude;
    validation_script.py:212-221 writes angular_error)."""
    if isinstance(objective, GeoposeObjective):
        return jnp.abs(decoded - raw_targets)
    return angular_error_deg(decoded, raw_targets)

"""Losses and metrics — pure jnp, mask-aware, usable inside jit.

Covers every objective the reference scripts use:

- MSE                          (swin_finetuning.py:89)
- Huber(delta)                 (swin_attempt_2.py:158, torch.nn.HuberLoss semantics)
- MAAE circular error, also used directly as a training loss
                               (efficientnet_finetuning.py:66-68)
- acos angular loss in degrees (swin_angle_finetuning_sin_cos.py:65-69)
- "competition loss" 0.5*(sum(dlat^2)+sum(dlon^2))/N
                               (swin_validation.py:100)

All functions take an optional boolean `mask` over the batch so padded rows
(static-shape batching on TPU) never contribute; reductions are computed as
masked means, matching the references' plain means on unpadded data.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    # Broadcast the batch mask over trailing dims; denominator counts the
    # unmasked *elements* so the result equals jnp.mean over the valid rows.
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
    per_row = x.size // mask.size
    denom = jnp.maximum(jnp.sum(m) * per_row, 1.0)
    return jnp.sum(x * m) / denom


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return _masked_mean((pred - target) ** 2, mask)


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.HuberLoss semantics: 0.5*d^2 if |d|<delta else delta*(|d|-0.5*delta)."""
    d = jnp.abs(pred - target)
    quad = 0.5 * d * d
    lin = delta * (d - 0.5 * delta)
    return _masked_mean(jnp.where(d < delta, quad, lin), mask)


def angular_error_deg(pred_deg: jnp.ndarray, true_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-sample circular error in degrees: min(|d| mod 360, 360 - |d| mod 360)."""
    d = jnp.abs(pred_deg - true_deg) % 360.0
    return jnp.minimum(d, 360.0 - d)


def maae_deg(pred_deg: jnp.ndarray, true_deg: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean absolute angular error in degrees (efficientnet_finetuning.py:66-68)."""
    return _masked_mean(angular_error_deg(pred_deg, true_deg), mask)


def acos_angular_loss_deg(pred_unit: jnp.ndarray, target_unit: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          eps: float = 1e-7) -> jnp.ndarray:
    """Mean geodesic angle (deg) between unit sin/cos vectors.

    Matches `angular_loss` at swin_angle_finetuning_sin_cos.py:65-69:
    acos(clamp(<pred, target>)) converted to degrees.
    """
    dot = jnp.sum(pred_unit * target_unit, axis=-1)
    dot = jnp.clip(dot, -1.0 + eps, 1.0 - eps)
    return _masked_mean(jnp.degrees(jnp.arccos(dot)), mask)


def competition_loss(pred_latlon: jnp.ndarray, true_latlon: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """0.5 * (sum(dlat^2) + sum(dlon^2)) / N  (swin_validation.py:100).

    Equivalent to the mean over lat&lon of per-axis MSE — i.e. the geopose
    val MSE the reference reports (validation_swin_2.py:191).
    """
    sq = (pred_latlon - true_latlon) ** 2
    if mask is not None:
        m = mask.astype(sq.dtype)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        return 0.5 * jnp.sum(sq * m) / n
    n = sq.shape[0]
    return 0.5 * jnp.sum(sq) / n


def geopose_metrics(pred_latlon: jnp.ndarray, true_latlon: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> dict:
    """The per-epoch geopose metric suite (swin_attempt_2.py:216-220,
    validation_swin_2.py:191-195): MSE, RMSE, MAE, per-axis MAE — computed
    on-device, original target scale."""
    err = pred_latlon - true_latlon
    mse = mse_loss(pred_latlon, true_latlon, mask)
    mae = _masked_mean(jnp.abs(err), mask)
    mae_lat = _masked_mean(jnp.abs(err[:, 0:1]), mask)
    mae_lon = _masked_mean(jnp.abs(err[:, 1:2]), mask)
    return {
        "mse": mse,
        "rmse": jnp.sqrt(mse),
        "mae": mae,
        "mae_lat": mae_lat,
        "mae_lon": mae_lon,
        "competition_loss": competition_loss(pred_latlon, true_latlon, mask),
    }

"""StandardScaler target codec as pure jnp.

The reference fits `sklearn.preprocessing.StandardScaler` on the *train-only*
(lat, lon) columns (swin_attempt_2.py:135-137), pickles it with joblib
(swin_attempt_2.py:139), and inverse-transforms predictions on the host every
eval batch (swin_attempt_2.py:207-208). Here the fit statistics are two small
arrays carried in the train state and checkpointed with it, so the inverse
transform runs on-device inside the jitted eval step — no per-batch D2H copy
and no pickle side-file.

Matches sklearn semantics: biased std (ddof=0); columns with zero variance
scale by 1.0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ScalerState(NamedTuple):
    mean: jnp.ndarray   # (D,)
    scale: jnp.ndarray  # (D,) std with ddof=0, zeros replaced by 1.0

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.scale

    def inverse_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.scale + self.mean


def fit_scaler(x: jnp.ndarray) -> ScalerState:
    """Fit on (N, D) training targets. Train-only fit is the caller's
    responsibility (the reference fits on the train CSV before building
    datasets, swin_attempt_2.py:135-137)."""
    x = jnp.asarray(x, dtype=jnp.float64 if x.dtype == jnp.float64 else jnp.float32)
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0)  # ddof=0, as sklearn
    scale = jnp.where(std == 0.0, 1.0, std)
    return ScalerState(mean=mean, scale=scale)


def identity_scaler(dim: int) -> ScalerState:
    """No-op codec for runs with scale_targets=False (angle workloads)."""
    return ScalerState(mean=jnp.zeros((dim,), jnp.float32),
                       scale=jnp.ones((dim,), jnp.float32))

"""Regression heads.

Covers every head shape in the reference:

- ``LinearHead``: Linear(D -> out)             (swin_finetuning.py:56,
  swin_angle_finetuning.py:55, convnext_finetuning.py:59)
- ``MlpHead``: Linear -> ReLU -> Dropout -> Linear  (swin_attempt_2.py:118-123
  with hidden=512 dropout=0.3; dinov2salad_finetuning.py:28-32 with two
  hidden layers, see `num_hidden_layers`)
- ``SinCosHead``: Dropout -> Linear(D -> 2) with optional unit-circle
  normalization (en_finetuning_gemini.py:75-80 without normalize;
  swin_angle_finetuning_sin_cos.py:62 with normalize)

All heads emit fp32 regardless of compute dtype (losses/metrics/export need
full precision).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geovpr.models.layers import normalize_l2


class LinearHead(nn.Module):
    out_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.out_dim, name="out", dtype=self.dtype)(features)
        return x.astype(jnp.float32)


class MlpHead(nn.Module):
    out_dim: int = 2
    hidden: int = 512
    dropout: float = 0.3
    num_hidden_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array, deterministic: bool = True) -> jax.Array:
        x = features
        for i in range(self.num_hidden_layers):
            x = nn.Dense(self.hidden, name=f"hidden{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="out", dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class SinCosHead(nn.Module):
    dropout: float = 0.3
    unit_normalize: bool = False
    hidden: int = 0  # 0 => single linear; >0 => MLP (swin_angle_finetuning_gemini.py:100-106)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dropout(self.dropout)(features, deterministic=deterministic)
        if self.hidden:
            x = nn.Dense(self.hidden, name="hidden0", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(2, name="out", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.unit_normalize:
            x = normalize_l2(x)
        return x


def build_head(head: str, out_dim: int, hidden: int = 512,
               dropout: float = 0.3, dtype=jnp.float32) -> nn.Module:
    if head == "linear":
        return LinearHead(out_dim=out_dim, dtype=dtype)
    if head == "mlp":
        return MlpHead(out_dim=out_dim, hidden=hidden, dropout=dropout,
                       dtype=dtype)
    if head == "mlp2":
        return MlpHead(out_dim=out_dim, hidden=hidden, dropout=dropout,
                       num_hidden_layers=2, dtype=dtype)
    if head == "sincos_linear":
        return SinCosHead(dropout=dropout, dtype=dtype)
    if head == "sincos_mlp":
        return SinCosHead(dropout=dropout, hidden=hidden, dtype=dtype)
    if head == "sincos_unit":
        return SinCosHead(dropout=dropout, unit_normalize=True, dtype=dtype)
    raise ValueError(f"unknown head {head!r}")

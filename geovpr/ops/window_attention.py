"""Windowed multi-head attention — the Swin hot op.

The reference gets this from cuDNN inside HF `SwinModel`
(`swin_transformer/swin_attempt_2.py:117`). Here it is a first-class op with
two implementations behind one signature:

- ``_window_attention_xla``: plain jnp einsum path — XLA already fuses the
  softmax chain well; used on CPU and as the autodiff-friendly default.
- ``_window_attention_pallas``: Pallas TPU kernel (see
  `geovpr/ops/pallas_window_attention.py`) computing block-local attention
  entirely in VMEM — one grid step per (batch-window, head) tile, no
  (H*W)^2 materialization.

Inputs are already window-partitioned: q/k/v are (BW, H, N, Dh) where
BW = batch * num_windows, N = window_size^2 (49 or 144). `bias` is the
relative-position bias (H, N, N); `mask` the shifted-window additive mask
(nW, N, N) or None.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _window_attention_xla(q, k, v, bias, mask, scale):
    # q,k,v: (BW, H, N, Dh); bias: (H, N, N); mask: (nW, N, N) | None
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    return _window_attention_from_scores(scores, v, bias, mask)


def _window_attention_from_scores(scores, v, bias, mask):
    """bias/mask add + softmax + PV from pre-scaled (BW, H, N, N) f32
    scores — shared by the bf16 path above and the int8-score serving
    fallback (SwinBlock._attention_int8), whose scores come from an
    int8 x int8 einsum dequantized by the static cs constant."""
    scores = scores + bias[None].astype(scores.dtype)
    if mask is not None:
        nw = mask.shape[0]
        bw = scores.shape[0]
        scores = scores.reshape(bw // nw, nw, *scores.shape[1:])
        scores = scores + mask[None, :, None].astype(scores.dtype)
        scores = scores.reshape(bw, *scores.shape[2:])
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    use_pallas: bool = False,
) -> jax.Array:
    """Block-local attention over pre-partitioned windows.

    Args:
      q, k, v: (batch*windows, heads, N, head_dim)
      bias: (heads, N, N) relative position bias
      mask: (num_windows, N, N) additive shifted-window mask, or None
      use_pallas: take the Pallas TPU kernel when on TPU
    Returns: (batch*windows, heads, N, head_dim)
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if use_pallas and jax.default_backend() == "tpu":
        from geovpr.ops.pallas_window_attention import window_attention_pallas
        return window_attention_pallas(q, k, v, bias, mask, scale)
    return _window_attention_xla(q, k, v, bias, mask, scale)

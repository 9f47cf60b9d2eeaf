"""Pallas TPU fused attention for short ViT sequences.

The DINOv2-B/14 hot path runs attention over N=257 tokens. The XLA path
materializes the (B, H, N, N) score tensor in HBM (~811 MB at B=256 —
measured ~6.2 ms/layer, ~17 TFLOP/s). At these lengths the entire per-head
problem fits in VMEM, so this kernel computes scores + softmax + weighted
values for one (batch, head) per grid step without ever touching HBM with
the N^2 intermediates — no online-softmax machinery needed (contrast flash
attention, which exists to handle N^2 that does NOT fit on-chip).

Shapes: q, k, v (B, H, N, Dh) with N padded to a multiple of 128 by the
wrapper (padding keys masked to -inf before softmax; padded query rows are
garbage and sliced off on return).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    # refs: (1, 1, NP, Dh) — one (batch, head) slab resident in VMEM
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    np_, dh = q.shape
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (NP, NP)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -1e30)                   # mask pad keys
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float, n_valid: int | None = None) -> jax.Array:
    """Fused softmax attention. q/k/v: (B, H, N, Dh). Returns (B, H, N, Dh).

    N is padded to a multiple of 128 internally; `n_valid` defaults to N.
    """
    b, h, n, dh = q.shape
    if n_valid is None:
        n_valid = n
    np_ = -(-n // 128) * 128
    if np_ != n:
        pad = [(0, 0), (0, 0), (0, np_ - n), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    grid = (b, h)
    spec = pl.BlockSpec((1, 1, np_, dh), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((b, h, np_, dh), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * np_ * dh,
            bytes_accessed=4 * np_ * dh * q.dtype.itemsize,
            transcendentals=np_ * np_),
    )(q, k, v)
    if np_ != n:
        out = out[:, :, :n, :]
    return out

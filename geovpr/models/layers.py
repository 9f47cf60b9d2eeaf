"""Shared building blocks (flax.linen, NHWC, dtype-policy aware)."""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# HF transformers' "gelu" is the exact erf form; flax's nn.gelu defaults to
# the tanh approximation — parity requires approximate=False.
gelu_exact = functools.partial(nn.gelu, approximate=False)


def gelu_fast(x: jax.Array) -> jax.Array:
    """GELU that is erf-exact in f32 and tanh-approximate in bf16.

    This is a measured speed/accuracy TRADEOFF, not a free change: the
    tanh approximation deviates from erf-GELU by up to 4.7e-4 absolute
    (at x~=-2.7, where the output is ~-0.0094 — several bf16 ULPs, ~5%
    relative in that tail), so bf16 activations do shift in the negative
    tail. It is accepted because erf costs ~2 ms/layer more than tanh at
    DINOv2-B MLP shapes on v5e (65792x3072 — erf lowers to a long
    rational-polynomial VPU chain that dominates the fused epilogue).
    Parity tests run the models in f32, where this stays erf-exact;
    bf16-vs-torch parity comparisons must budget for the activation delta.
    """
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class DropPath(nn.Module):
    """Stochastic depth — drops the whole residual branch per sample.

    EfficientNet-B0 (torchvision) uses rate 0.2 linearly scaled over blocks;
    ConvNeXt/Swin use per-block schedules. Identity when deterministic.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SqueezeExcite(nn.Module):
    """SE block: global-average pool -> reduce -> SiLU -> expand -> sigmoid gate.

    Matches torchvision ``SqueezeExcitation`` (1x1 convs) so EfficientNet
    weights import 1:1.
    """

    squeeze_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C)
        scale = jnp.mean(x, axis=(1, 2), keepdims=True)
        scale = nn.Conv(self.squeeze_channels, (1, 1), name="fc1",
                        dtype=self.dtype)(scale)
        scale = nn.silu(scale)
        scale = nn.Conv(x.shape[-1], (1, 1), name="fc2", dtype=self.dtype)(scale)
        return x * nn.sigmoid(scale)


class Mlp(nn.Module):
    """Transformer MLP: Linear -> act -> Linear (+dropout).

    Serving-path extras (see geovpr/ops/quant.py and
    geovpr/models/quantize.py):
    - ``calibrate=True``: sow per-tensor activation amaxes into the
      "quant_calib" collection (zero-cost unless that collection is
      mutable) — consumed by ``quantize_for_serving``.
    - ``int8=True``: INFERENCE-ONLY w8a8 path — int8 matmuls against
      pre-quantized kernels from the "quant" collection with static
      activation scales. Init still builds the regular f32 param tree
      (checkpoint structure is unchanged); dropout is skipped (serving is
      deterministic) and the activation runs tanh-GELU in f32 (erf f32
      costs ~2 ms/layer at DINOv2-B shapes, same tradeoff as gelu_fast
      in bf16).
    - ``fused=(ln_scale, ln_bias, gamma, eps)`` (int8 only): the caller
      passes the PRE-norm residual stream as ``x``; the whole
      LN -> int8 MLP -> LayerScale -> +residual block runs as one Pallas
      kernel on TPU (geovpr/ops/pallas_mlp.py — keeps the (M, 4D) hidden
      activations in VMEM instead of an ~808 MB/layer HBM round trip), or
      as arithmetic-identical XLA ops elsewhere.
    - ``fused_residual`` (fused only): a distinct residual stream for
      blocks where the skip connection bypasses more than the MLP half —
      ConvNeXt adds the PRE-dwconv stream around dwconv+LN+MLP
      (models/convnext.py). Default None keeps ``x`` as the residual
      (the transformer-block case, no extra stream read in the kernel).
    """

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu_fast
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    int8: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 fused=None, fused_residual=None) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        in_dim = x.shape[-1]
        if self.int8:
            q = {
                "a_in_scale": self.variable(
                    "quant", "a_in_scale", jnp.ones, (), jnp.float32),
                "a_mid_scale": self.variable(
                    "quant", "a_mid_scale", jnp.ones, (), jnp.float32),
                "fc1_kernel_q": self.variable(
                    "quant", "fc1_kernel_q", jnp.zeros,
                    (in_dim, self.hidden_dim), jnp.int8),
                "fc1_kernel_scale": self.variable(
                    "quant", "fc1_kernel_scale", jnp.ones,
                    (self.hidden_dim,), jnp.float32),
                "fc1_bias": self.variable(
                    "quant", "fc1_bias", jnp.zeros, (self.hidden_dim,),
                    jnp.float32),
                "fc2_kernel_q": self.variable(
                    "quant", "fc2_kernel_q", jnp.zeros,
                    (self.hidden_dim, out_dim), jnp.int8),
                "fc2_kernel_scale": self.variable(
                    "quant", "fc2_kernel_scale", jnp.ones, (out_dim,),
                    jnp.float32),
                "fc2_bias": self.variable(
                    "quant", "fc2_bias", jnp.zeros, (out_dim,), jnp.float32),
            }
            if not self.is_initializing():
                from geovpr.ops.quant import int8_dense
                a_in = q["a_in_scale"].value
                a_mid = q["a_mid_scale"].value
                residual = None
                if fused is not None:
                    ln_scale, ln_bias, gamma, eps = fused
                    if jax.default_backend() == "tpu":
                        from geovpr.ops.pallas_mlp import fused_mlp_block_int8
                        return fused_mlp_block_int8(
                            x, ln_scale.astype(jnp.float32) / a_in,
                            ln_bias.astype(jnp.float32) / a_in,
                            q["fc1_kernel_q"].value,
                            a_in * q["fc1_kernel_scale"].value,
                            q["fc1_bias"].value,
                            q["fc2_kernel_q"].value,
                            a_mid * q["fc2_kernel_scale"].value,
                            q["fc2_bias"].value,
                            gamma.astype(jnp.float32), 1.0 / a_mid,
                            ln_eps=eps, residual=fused_residual)
                    # XLA fallback: same arithmetic, unfused
                    residual = x if fused_residual is None \
                        else fused_residual
                    xf = x.astype(jnp.float32)
                    mu = jnp.mean(xf, axis=-1, keepdims=True)
                    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
                    x = ((xf - mu) * jax.lax.rsqrt(var + eps)
                         * ln_scale.astype(jnp.float32)
                         + ln_bias.astype(jnp.float32))
                lead = x.shape[:-1]
                h = x.reshape(-1, in_dim).astype(jnp.float32)
                h = int8_dense(h, a_in, q["fc1_kernel_q"].value,
                               q["fc1_kernel_scale"].value,
                               q["fc1_bias"].value)
                h = nn.gelu(h, approximate=True)
                h = int8_dense(h, a_mid, q["fc2_kernel_q"].value,
                               q["fc2_kernel_scale"].value,
                               q["fc2_bias"].value)
                out = h.reshape(*lead, out_dim)
                if residual is not None:
                    out = out * gamma.astype(jnp.float32) \
                        + residual.astype(jnp.float32)
                    out = jax.lax.stop_gradient(out)
                return out.astype(residual.dtype if residual is not None
                                  else x.dtype)

        if self.calibrate:
            self.sow("quant_calib", "a_in",
                     jnp.max(jnp.abs(x.astype(jnp.float32))))
        x = nn.Dense(self.hidden_dim, name="fc1", dtype=self.dtype)(x)
        x = self.act(x)
        if self.calibrate:
            self.sow("quant_calib", "a_mid",
                     jnp.max(jnp.abs(x.astype(jnp.float32))))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, name="fc2", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x



def normalize_l2(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization matching torch.nn.functional.normalize semantics
    (norm clamped below by eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


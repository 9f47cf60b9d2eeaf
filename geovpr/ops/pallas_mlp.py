"""Pallas TPU fused w8a8 MLP block for the int8 serving path.

One grid program = a row block of the flattened (B*N, D) token stream:

    x (R, D) -> LN -> quantize -> int8 @ Wq1 (D, 4D) -> dequant -> tanh GELU
      -> quantize -> int8 @ Wq2 (4D, D) -> dequant -> LayerScale -> +residual

Why a kernel at all (the bf16 LN+MLP kernel LOST to XLA, docs/DESIGN.md
"Where XLA won"): the w8a8 XLA path materializes the (M, 4D) f32 hidden
activations to HBM between the two matmuls — ~808 MB/layer at DINOv2-B
B=256, ~1 ms of pure bandwidth the MXU can't hide behind 1.76 ms of int8
matmul. In VMEM the hidden never leaves the chip. The MLP is row-local
(LN is rowwise, matmuls are per-row), so the grid tiles the flat token
stream with no attention-style alignment constraints; a ragged final
block is handled by Mosaic's OOB masking.

Static scales are pre-folded by the caller (`Mlp` in
geovpr/models/layers.py): 1/a_in into the LN scale/bias, a_in * s1 into
the fc1 dequant row, a_mid * s2 into the fc2 dequant row. Only the
1/a_mid quantize multiply survives (GELU is nonlinear — nothing to fold
through); it rides in SMEM as a (1, 1) scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid program: hidden f32 (R, 4D) is the VMEM budget driver
# (R=512, D=768 -> 6 MB hidden + 3.4 MB int8 weights + IO blocks)
_ROW_BLOCK = 512


def _mlp_int8_core(inv_a_mid_ref, x_ref, ln_scale_ref, ln_bias_ref,
                   w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                   gamma_ref, ln_eps: float):
    """LN -> int8 MLP -> LayerScale; returns (x_f32, scaled MLP out f32)."""
    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
    xq = jnp.clip(jnp.round(normed * ln_scale_ref[:].astype(jnp.float32)
                            + ln_bias_ref[:].astype(jnp.float32)),
                  -127, 127).astype(jnp.int8)

    h = jax.lax.dot(xq, w1q_ref[:], preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * s1_ref[:] + b1_ref[:]
    # tanh GELU (erf costs ~2 ms/layer at these shapes; same tradeoff as
    # gelu_fast on the bf16 path)
    g = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                  * (h + 0.044715 * h * h * h)))
    gq = jnp.clip(jnp.round(g * inv_a_mid_ref[0]), -127, 127
                  ).astype(jnp.int8)

    y = jax.lax.dot(gq, w2q_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s2_ref[:] + b2_ref[:]
    return xf, y * gamma_ref[:].astype(jnp.float32)


def _mlp_int8_kernel(inv_a_mid_ref, x_ref, ln_scale_ref, ln_bias_ref,
                     w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                     gamma_ref, o_ref, *, ln_eps: float):
    xf, y = _mlp_int8_core(inv_a_mid_ref, x_ref, ln_scale_ref, ln_bias_ref,
                           w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                           gamma_ref, ln_eps)
    o_ref[:] = (y + xf).astype(o_ref.dtype)


def _mlp_int8_res_kernel(inv_a_mid_ref, x_ref, res_ref, ln_scale_ref,
                         ln_bias_ref, w1q_ref, s1_ref, b1_ref, w2q_ref,
                         s2_ref, b2_ref, gamma_ref, o_ref, *,
                         ln_eps: float):
    """Separate-residual variant: out = res + gamma * MLP(LN(x)).

    ConvNeXt's block shape (reference convnext_finetuning.py:55-64 via HF
    ConvNextLayer): the channel MLP's input is the dwconv OUTPUT while the
    residual is the pre-dwconv stream, so unlike the transformer blocks the
    residual is a distinct (R, D) operand. Costs one extra stream read per
    block — the bf16 XLA path pays the same read for its `x +` add."""
    _, y = _mlp_int8_core(inv_a_mid_ref, x_ref, ln_scale_ref, ln_bias_ref,
                          w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                          gamma_ref, ln_eps)
    o_ref[:] = (y + res_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def fused_mlp_block_int8(x: jax.Array, ln_scale_q: jax.Array,
                         ln_bias_q: jax.Array, w1q: jax.Array,
                         s1_eff: jax.Array, b1: jax.Array, w2q: jax.Array,
                         s2_eff: jax.Array, b2: jax.Array,
                         gamma: jax.Array, inv_a_mid: jax.Array,
                         ln_eps: float = 1e-6,
                         residual: jax.Array | None = None) -> jax.Array:
    """out = residual + gamma * MLP_int8(LN(x)); x: (..., D), any leading
    shape (flattened to rows internally). residual=None means x itself
    (the transformer-block case — no extra stream read). Serving-only —
    no VJP."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    hidden = w1q.shape[1]
    xf = x.reshape(-1, d)
    m = xf.shape[0]
    grid = -(-m // _ROW_BLOCK)

    row_spec = pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    res_args, res_specs = (), ()
    if residual is not None:
        assert residual.shape == x.shape, (residual.shape, x.shape)
        kernel = functools.partial(_mlp_int8_res_kernel, ln_eps=ln_eps)
        res_args = (residual.reshape(-1, d),)
        res_specs = (row_spec,)
    else:
        kernel = functools.partial(_mlp_int8_kernel, ln_eps=ln_eps)
    whole = lambda i: (0, 0)
    vec = lambda i: (0,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            *res_specs,
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the ~16 MB default scope sits within 600 KB of this kernel's
            # stack at Swin stage-3 shapes (C=1024: the f32 hidden block
            # alone is 8 MB) and intermittently OOMs across remote
            # compiles; 28 MB matches the other serving kernels, and the
            # knob measured flat 28-96 MB on the int8 path (DESIGN.md)
            vmem_limit_bytes=28 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * hidden,
            bytes_accessed=((3 if residual is not None else 2)
                            * m * d * x.dtype.itemsize + 2 * d * hidden),
            transcendentals=m * hidden),
    )(jnp.reshape(inv_a_mid.astype(jnp.float32), (1,)), xf, *res_args,
      ln_scale_q, ln_bias_q, w1q, s1_eff, b1, w2q, s2_eff, b2, gamma)
    return jax.lax.stop_gradient(out.reshape(*lead, d))


"""Pallas TPU kernel: block-local (shifted-)window attention for Swin.

The reference's windowed attention lives inside the pretrained HF `SwinModel`
(`swin_transformer/swin_attempt_2.py:117`) and runs as cuDNN dense attention
per window. The TPU-native formulation (SURVEY.md §5 "long-context" row):
window partitioning makes attention BLOCK-DIAGONAL over the token grid, so
each grid program materializes only its windows' (N, N) score tiles in VMEM —
the (H*W)^2 mask/score matrix never exists, and softmax+bias+shift-mask fuse
into the two matmuls.

Layout: the (BW, H, N, dh) head split is re-fused to rows of (BW*N, d) so
every program does tall-skinny matmuls on lane-aligned slices (the same
trick as `pallas_mhsa`):

    per window w, head h:
        s = q[wN:(w+1)N, h*dh:(h+1)dh] @ k[...].T * scale     (N, N) in VMEM
        s += rel_pos_bias[h] (+ shift_mask[w])
        out[rows, lanes] = softmax(s) @ v[rows, lanes]

`wb` windows are packed per program so the row count wb*N is a multiple of
the 8-sublane quantum even for N=49 (window 7). Autodiff: forward runs the
kernel, backward re-derives gradients from the XLA reference implementation
(recompute — cheaper than stashing N^2 probabilities to HBM).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# softmax without the max-shift (clamp-guarded): exp2(s)/sum(exp2(s)) is
# shift-invariant, the shift is pure VPU cost, and this kernel only runs
# on the deterministic eval path (SwinBlock pallas_ok; the custom-VJP
# backward recomputes from XLA, not from these probabilities). Same
# reasoning and knob as geovpr/ops/pallas_mhsa.py.
_SKIP_MAX = os.environ.get("GEOVPR_MHSA_SKIP_MAX", "1") == "1"


def _pick_wb(n: int, bw: int, nw: int) -> int:
    """Windows per program: smallest wb making wb*n a sublane multiple,
    while wb divides BW and (wb | nW or nW | wb)."""
    wb = 1
    while (wb * n) % 8 != 0:
        wb *= 2
    if bw % wb != 0:
        return 0
    if nw % wb != 0 and wb % nw != 0:
        return 0
    return wb


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
            num_heads: int, n: int, wb: int, scale: float, mask_windows: int):
    """Stage-split window attention (the `pallas_mhsa` round-2 recipe
    applied here, measured at Swin-B-384 stage-2 shapes BW=256 H=16 N=144
    dh=32: XLA 2.50 / old fused-loop kernel 1.87 / this 1.80 ms):

    - operands stay in the input dtype (bf16 on the production path) with
      f32 MXU accumulation — the old f32 casts before the matmuls cost
      extra VPU passes and halve MXU throughput for nothing (the MXU
      truncates operands to bf16 internally anyway);
    - exp2-domain softmax with scale x log2(e) folded into q by one
      multiply (bias and mask scaled by log2(e) on their f32 add);
    - the per-(window, head) work is issued as three unrolled passes —
      all score matmuls, then all softmax chains, then all pv matmuls —
      so Mosaic overlaps the independent MXU and VPU streams."""
    d = q_ref.shape[-1]
    dh = d // num_heads
    log2e = math.log2(math.e)
    qs = (q_ref[:].astype(jnp.float32) * (scale * log2e)).astype(q_ref.dtype)
    ks = k_ref[:]
    ss = []
    for w in range(wb):                     # stage 1: all score matmuls
        rows = slice(w * n, (w + 1) * n)
        for h in range(num_heads):
            lanes = slice(h * dh, (h + 1) * dh)
            ss.append(jax.lax.dot_general(
                qs[rows, lanes], ks[rows, lanes],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
    ps = []
    i = 0
    for w in range(wb):                     # stage 2: all softmaxes (VPU)
        # mask rows for this window inside the (mask_windows*n, n) block
        mrows = slice((w % mask_windows) * n, (w % mask_windows + 1) * n)
        m_w = mask_ref[mrows, :].astype(jnp.float32) * log2e
        for h in range(num_heads):
            s = (ss[i] + bias_ref[h * n:(h + 1) * n, :].astype(jnp.float32)
                 * log2e + m_w)
            if _SKIP_MAX:
                p = jnp.exp2(jnp.minimum(s, 100.0))
            else:
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s)
            ps.append((p, jnp.sum(p, axis=-1, keepdims=True)))
            i += 1
    i = 0
    for w in range(wb):                     # stage 3: all pv matmuls
        rows = slice(w * n, (w + 1) * n)
        for h in range(num_heads):
            lanes = slice(h * dh, (h + 1) * dh)
            v = v_ref[rows, lanes]
            p, z = ps[i]
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32) / z
            o_ref[rows, lanes] = o.astype(o_ref.dtype)
            i += 1


def _forward(q, k, v, bias, mask, scale):
    bw, num_heads, n, dh = q.shape
    d = num_heads * dh
    nw = 1 if mask is None else mask.shape[0]
    wb = _pick_wb(n, bw, nw)
    if wb == 0:
        from geovpr.ops.window_attention import _window_attention_xla
        return _window_attention_xla(q, k, v, bias, mask, scale)

    def fuse(t):  # (BW, H, N, dh) -> (BW*N, H*dh)
        return t.transpose(0, 2, 1, 3).reshape(bw * n, d)

    qf, kf, vf = fuse(q), fuse(k), fuse(v)
    bias_f = bias.reshape(num_heads * n, n)
    if mask is None:
        mask_f = jnp.zeros((wb * n, n), qf.dtype)
        mask_windows = wb
        mask_index = lambda i: (0, 0)
    elif wb % nw == 0:
        # program spans >= one full mask period: tile to wb windows
        mask_f = jnp.tile(mask, (wb // nw, 1, 1)).reshape(wb * n, n)
        mask_windows = wb
        mask_index = lambda i: (0, 0)
    else:
        # wb divides nW: pick the right slab of the flattened mask
        mask_f = mask.reshape(nw * n, n)
        mask_windows = wb
        mask_index = lambda i: (i % (nw // wb), 0)

    grid = (bw // wb,)
    kernel = functools.partial(_kernel, num_heads=num_heads, n=n, wb=wb,
                               scale=scale, mask_windows=mask_windows)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bw * n, d), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wb * n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads * n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_windows * n, n), mask_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb * n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # stage-split keeps all (window, head) f32 score planes live;
            # Swin shapes peak well under this (stage2: ~2.7 MB), and 28 MB
            # is the scope the stage-split kernels were measured at
            vmem_limit_bytes=28 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * bw * num_heads * n * n * dh,
            bytes_accessed=4 * bw * n * d * q.dtype.itemsize,
            transcendentals=bw * num_heads * n * n),
    )(qf, kf, vf, bias_f, mask_f)
    return out.reshape(bw, n, num_heads, dh).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_attention_pallas(q, k, v, bias, mask, scale):
    """(BW, H, N, dh) block-local attention; see module docstring."""
    return _forward(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    return _forward(q, k, v, bias, mask, scale), (q, k, v, bias, mask)


def _bwd(scale, res, g):
    from geovpr.ops.window_attention import _window_attention_xla
    q, k, v, bias, mask = res
    if mask is None:
        f = lambda q, k, v, bias: _window_attention_xla(q, k, v, bias, None,
                                                        scale)
        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        return dq, dk, dv, dbias, None
    _, vjp = jax.vjp(
        lambda q, k, v, bias, mask: _window_attention_xla(q, k, v, bias, mask,
                                                          scale),
        q, k, v, bias, mask)
    return vjp(g)


window_attention_pallas.defvjp(_fwd, _bwd)

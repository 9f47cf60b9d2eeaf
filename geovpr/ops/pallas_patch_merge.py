"""Pallas TPU fused PatchMerging stage boundary for the alternating
window layout (serving). Default ON (`GEOVPR_SWIN_ALT_MERGE=0` to
disable): Swin-B-384 int8 eval B=64 runs **47.88 / 47.83 ms** with this
kernel vs **52.24 / 52.34 / 52.34 ms** with the XLA boundary across
repeated same-session A/B pairs, and its geopose leg inside the fused
three-head program wins 49.4 vs 53.1 ms (4/4 runs) — a further ~9%
eval win on top of the alternating layout (1,223 -> 1,338 img/s,
benches/SWIN_EVAL_ALT_r04.log + FUSE_AB_r04.log). One early
measurement (53.61 ms, the kernel's very first timed run) read SLOWER
and briefly demoted it; two independent repeats and the fuse-harness
majority identified that run as an outlier — the measurement discipline
note (repeat before you demote) is recorded in docs/DESIGN.md.

What it does when enabled: with `GEOVPR_SWIN_ALT_LAYOUT` serving
(models/swin.py), a stage's stream ends window-partitioned in the LAST
block's shift layout; each grid program owns one NEXT-stage window-row,
reads the three adjacent current-stage window-rows its 2x2 sources span
(the ±shift roll rides the operand index maps + static VMEM slices, same
scheme as `pallas_swin_block._roll_assemble`), merges, normalizes,
projects on the MXU, and writes next-stage windows directly.

Replaces the reference's eager `SwinPatchMerging` (inside HF `SwinModel`,
`swin_transformer/swin_attempt_2.py:117`). Serving-only: the training
path keeps the XLA boundary (layout residency gains ~nothing there —
the step is backward-bound)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 28 * 1024 * 1024


def patch_merge_rolled_ok(res: int, c: int, window: int, next_window: int,
                          shift: int, bw: int) -> bool:
    """Eligibility: square stages, lane-aligned channels, the next stage's
    window matching this stage's (one program = one next-stage window-row
    = `window` raster rows), a live shift (the roll structure is baked into
    the three-operand row split), and clean divisibility."""
    nw = (res // window) ** 2
    return (c % 128 == 0 and window == next_window
            and 0 < shift < window and shift % 2 == 0
            and window % 2 == 0 and res % window == 0
            and (res // 2) % next_window == 0
            and res // window >= 2               # >= 2 source window-rows
            and bw % nw == 0)


def _merge_kernel(xa_ref, xb_ref, xc_ref, ln_s_ref, ln_b_ref, w_ref, o_ref,
                  *, window: int, nw_x: int, c: int, off: int,
                  ln_eps: float):
    """Mosaic layout discipline (learned the hard way — the first cut
    strided-sliced a (rows, 2, cols, 2, C) view and died in tpu.concatenate
    with "offset mismatch on non-concat dimension" on real hardware): the
    2x2 parity split must never stride a tiled dimension. Rows: slice the
    even/odd axis BEFORE the stripe transpose, while it is still a plain
    middle dimension of a 5D view. Columns: merge column PAIRS into the
    lane dim (a minor-dims reshape), so odd-column selection becomes a
    128-aligned lane slice and the ±shift column roll moves whole pairs
    (shift is even — gated)."""
    wfull = nw_x * window
    half = window // 2
    q = off // 2        # roll in row/column PAIRS (off even, gated)
    wp = wfull // 2

    def stripes(ref):
        # even/odd-row raster stripes, each (window//2, W, C)
        t = ref[:].reshape(nw_x, half, 2, window, c)
        se = t[:, :, 0].transpose(1, 0, 2, 3).reshape(half, wfull, c)
        so = t[:, :, 1].transpose(1, 0, 2, 3).reshape(half, wfull, c)
        return se, so

    ae, ao = stripes(xa_ref)
    be, bo = stripes(xb_ref)
    ce, co = stripes(xc_ref)
    # rows: the 2*window source raster rows start at -off in the rolled
    # stream (unroll = roll(+off)); off is even, so source parity is
    # target parity and the split stripes stack independently
    rows_e = jnp.concatenate([ae[half - q:], be, ce[:half - q]], axis=0)
    rows_o = jnp.concatenate([ao[half - q:], bo, co[:half - q]], axis=0)
    # columns: pairs into lanes, then unroll by q pairs
    rwe = rows_e.reshape(window, wp, 2 * c)
    rwo = rows_o.reshape(window, wp, 2 * c)
    rwe = jnp.concatenate([rwe[:, wp - q:], rwe[:, :wp - q]], axis=1)
    rwo = jnp.concatenate([rwo[:, wp - q:], rwo[:, :wp - q]], axis=1)
    # HF SwinPatchMerging concat order [x00, x10, x01, x11]; every operand
    # is lane-slice-aligned with zero sublane offset
    m = jnp.concatenate([rwe[..., :c], rwo[..., :c],
                         rwe[..., c:], rwo[..., c:]], axis=-1)
    m = m.reshape(window * wp, 4 * c)

    mf = m.astype(jnp.float32)
    mu = jnp.mean(mf, axis=-1, keepdims=True)
    var = jnp.mean((mf - mu) ** 2, axis=-1, keepdims=True)
    ln = ((mf - mu) * jax.lax.rsqrt(var + ln_eps)
          * ln_s_ref[:].astype(jnp.float32)
          + ln_b_ref[:].astype(jnp.float32))

    y = jnp.dot(ln.astype(w_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32)
    # next-stage partition: (window, nw_x2, window, 2c) -> windows-major
    nw_x2 = wfull // 2 // window
    o = y.reshape(window, nw_x2, window, 2 * c).transpose(1, 0, 2, 3)
    o_ref[:] = o.reshape(nw_x2 * window * window, 2 * c).astype(o_ref.dtype)


def fused_patch_merge_rolled(xw, ln_scale, ln_bias, w, *, resolution: int,
                             window: int, next_window: int, shift: int,
                             ln_eps: float = 1e-5):
    """(B*nW, N, C) current-stage stream in `shift` layout -> (B*nW2, N2,
    2C) NEXT-stage (unshifted) window layout, = window_reverse -> roll
    (+shift, +shift) -> HF 2x2 concat -> LN -> reduction -> partition.
    Returns None when `patch_merge_rolled_ok` fails. Serving-only (the
    caller stop-gradients; there is no VJP)."""
    bw, n, c = xw.shape
    if not patch_merge_rolled_ok(resolution, c, window, next_window, shift,
                                 bw):
        return None
    nw_lin = resolution // window
    nw = nw_lin * nw_lin
    b = bw // nw
    res2 = resolution // 2
    nw_lin2 = res2 // next_window
    n2 = next_window * next_window

    xf = xw.reshape(bw * n, c)
    kernel = functools.partial(_merge_kernel, window=window, nw_x=nw_lin,
                               c=c, off=shift, ln_eps=ln_eps)

    def row(j):
        # current-stage window-row block index for next-stage row i
        def idx(i):
            return ((i // nw_lin2) * nw_lin
                    + (2 * (i % nw_lin2) + j + nw_lin) % nw_lin, 0)
        return pl.BlockSpec((nw_lin * n, c), idx, memory_space=pltpu.VMEM)

    vec = lambda i: (0,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * nw_lin2 ** 2 * n2, 2 * c),
                                       xw.dtype),
        grid=(b * nw_lin2,),
        in_specs=[
            row(-1), row(0), row(1),
            pl.BlockSpec((4 * c,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nw_lin2 * n2, 2 * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * bw * n * c * c,
            bytes_accessed=3 * bw * n * c * xw.dtype.itemsize,
            transcendentals=0),
    )(xf, xf, xf, ln_scale, ln_bias, w)
    return jax.lax.stop_gradient(
        out.reshape(b * nw_lin2 ** 2, n2, 2 * c))

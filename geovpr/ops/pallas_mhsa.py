"""Pallas TPU fused multi-head self-attention BLOCK for short ViT sequences.

One grid program = `bb` batch elements. Per program, entirely in VMEM:

    x (bb*NP, D) @ Wqkv (D, 3D)   -> qkv       [one big MXU matmul]
    per (elem, head): softmax(q k^T * scale) v  [N^2 never leaves VMEM]
    concat heads @ Wo (D, D) + bo  -> out      [one big MXU matmul]

Rationale (measured on the attached TPU, B=256 N=257 D=768 H=12):
- XLA path: qkv+proj 3.2 ms + attention core 6.2 ms per layer, the latter
  bandwidth-bound on the (B,H,N,N) HBM round-trip.
- naive Pallas (grid over B*H, matmul per head): 8.5 ms — 3072 small
  matmuls starve the MXU.
- this kernel keeps the projections as two large matmuls (M = bb*384) and
  confines the small per-head attention arithmetic to VMEM.

Weights (~4.7 MB bf16) are grid-invariant, so Mosaic keeps them resident
across programs. Rows are padded to the 16-sublane quantum only (N=257 ->
272), not a full 128 tile: N is the sublane dim of every matmul, and 384-row
padding cost 1.4x projection / 2.2x attention FLOPs. Measured at B=256
N=257 D=768 H=12: XLA 9.4 ms/layer; this kernel 6.2 (bb=1, 384-pad) ->
5.2 ms/layer (bb=2, 272-pad). bb=4 exceeds the 16 MB VMEM scope.
Round 2 (the `_mhsa_kernel_v3` fast path below): 3.03 ms/layer.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geovpr.ops import lane_pack as _lp

_LOG2E = math.log2(math.e)
# schedule-steering knob for the stage-split kernels (see _v3_fast_path
# docstring: the e2e sweep is sharply non-monotone, 28 MB is the measured
# optimum for the bf16 12-layer model). Env override for re-tuning sweeps.
_VMEM_LIMIT_MB = int(os.environ.get("GEOVPR_MHSA_VMEM_MB", "28"))
# serving softmax without the max-shift (see _stage_split_attention
# `skip_max`) — overflow-safe via clamp, measured faster; env opt-out for
# A/B remeasurement
_SKIP_MAX = os.environ.get("GEOVPR_MHSA_SKIP_MAX", "1") == "1"
# lane-packed TRAINING cores (g = 128/dh heads per core matmul via
# block-diagonal operands, geovpr/ops/lane_pack.py): measured SLOWER for
# the ViT's dh=64/g=2 geometry — B=64 train step 72.4 -> 82.4 ms
# same-session (docs/DESIGN.md). Unlike Swin's dh=32/g=4 (4x op cut on a
# quarter-filled MXU, 169 -> 141 ms), g=2 only halves the op count on an
# already half-filled MXU and the block-diagonal assembly + per-band
# reductions eat the margin. Default OFF; env knob for A/B only.
_PACKED_TRAIN = os.environ.get("GEOVPR_MHSA_PACKED", "0") == "1"
# the generic masked kernels (the non-key-split fallback path, e.g. an
# f32 model at production N) need their scoped-VMEM limit raised past the
# 16 MB default: base-14 f32 at bb=2 measures 17 MB of stack and the
# compile hard-fails (seen live: the driver's f32 entry() compile check).
# 64 MB is far under the 128 MB chip VMEM and the path is correctness-,
# not performance-critical.
_MASKED_VMEM_LIMIT = 64 * 1024 * 1024
# all-in-one training backward (see _mhsa_bwd_all_kernel) — env opt-out
# for A/B remeasurement against the split composition
_BWD_ALL = os.environ.get("GEOVPR_MHSA_BWD_ALL", "1") == "1"
# its own schedule knobs (swept independently of the forward kernels)
_BWD_ALL_VMEM_MB = int(os.environ.get("GEOVPR_MHSA_BWDALL_VMEM_MB", "28"))
_BWD_ALL_PLANES_MB = int(os.environ.get("GEOVPR_MHSA_BWDALL_PLANES_MB", "6"))


def _v3_fast_path(n: int, np_: int, num_heads: int, bb: int, width: int,
                  dtype):
    """Gate for the stage-split fast-path kernels. Returns the
    CompilerParams to compile them with, or None -> use the masked kernel.

    Conditions (all load-bearing, each violated case VERIFIED to matter):
    - n = 128k+1: the key-split layout only exists for ViT patches+CLS.
    - bf16 activations: f32 doubles every live buffer — Mosaic compile
      fails with a VMEM OOM at base-14 f32 (confirmed on v5e).
    - stage-buffer footprint cap: the split keeps all heads' f32 score +
      probability planes live at once; at large-14 (H=16, D=1024) that
      already exceeds the scope and Mosaic OOMs (confirmed). 14 MB admits
      every tuned config (base-14 bb=2 = 13.3 MB) and rejects larger ones.
    `width` is the live score-plane width: n-1 for the key-split forward
    kernels, np_ for the masked-shape backward.

    The 28 MB vmem_limit_bytes is a measured e2e OPTIMUM, not a cap — the
    12-layer sweep is sharply non-monotone (28 MB: 86.3 ms/batch; 24:
    88.0; 32/40/64: ~94.7, worse than the unsplit kernel, even though
    64 MB microbenches faster standalone). Sweep against the full model
    if these kernels change.
    """
    if not (n > 128 and (n - 1) % 128 == 0):
        return None
    plane_bytes = num_heads * np_ * width * 4 * 2 * bb
    # tiny shapes (unit tests, small variants) can't OOM in any dtype;
    # production-scale f32 is rejected outright
    if dtype != jnp.bfloat16 and plane_bytes > 2 * 1024 * 1024:
        return None
    if plane_bytes > 14 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=_VMEM_LIMIT_MB * 1024 * 1024)


def _stage_split_attention(qf, kv, ctx_ref, *, rows, d: int, dh: int,
                           num_heads: int, na: int,
                           quantize_out: bool = False,
                           skip_max: bool = False):
    """The shared key-split + exp2 + deferred-norm + stage-split attention
    core of the v3 kernels. `qf` (M, D) must already have the softmax
    scale x log2(e) folded into it; `kv` is the (M, 2D) k|v column block.
    Writes per-head context for `rows` into ctx_ref. Pure Python helper:
    traces/unrolls identically to inlined code, zero runtime cost.

    `quantize_out`: round/clip the f32 context to int8 before the store
    (the int8 serving kernel pre-scales v by 1/a_ctx, so the context
    arrives already in quantized units).

    `skip_max`: drop the max-subtraction from the softmax. The shift
    exists only for overflow protection — exp2(s)/sum(exp2(s)) is
    mathematically shift-invariant — and the per-head 256-lane max-reduce
    + (NP, na) broadcast-subtract are pure VPU cost. A one-op elementwise
    clamp at +100 (exp2(100) = 1.6e30; z <= 257 * 1.6e30 << f32 max)
    provides the same protection; underflow of far-from-max scores is
    harmless (those probabilities round to 0 anyway). Serving-only: the
    training kernels keep the shift so saved residuals match the
    backward's recompute exactly."""
    ss, sbs = [], []
    for h in range(num_heads):          # stage 1: all score matmuls
        q = qf[rows, h * dh:(h + 1) * dh]
        k = kv[rows, h * dh:(h + 1) * dh]
        ss.append(jax.lax.dot_general(  # (NP, na) f32, log2 domain
            q, k[:na], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        sbs.append(jnp.sum(
            q.astype(jnp.float32) * k[na:na + 1].astype(jnp.float32),
            axis=-1, keepdims=True))
    ps, pbs, zs = [], [], []
    for h in range(num_heads):          # stage 2: all softmaxes (VPU)
        if skip_max:
            p = jnp.exp2(jnp.minimum(ss[h], 100.0))
            pb = jnp.exp2(jnp.minimum(sbs[h], 100.0))
        else:
            mx = jnp.maximum(jnp.max(ss[h], axis=-1, keepdims=True), sbs[h])
            p = jnp.exp2(ss[h] - mx)
            pb = jnp.exp2(sbs[h] - mx)
        ps.append(p)
        pbs.append(pb)
        zs.append(jnp.sum(p, axis=-1, keepdims=True) + pb)
    for h in range(num_heads):          # stage 3: all pv matmuls
        v = kv[rows, d + h * dh:d + (h + 1) * dh]
        o = jnp.dot(ps[h].astype(v.dtype), v[:na],
                    preferred_element_type=jnp.float32)
        o = (o + pbs[h] * v[na:na + 1].astype(jnp.float32)) / zs[h]
        if quantize_out:
            o = jnp.clip(jnp.round(o), -127, 127)
        ctx_ref[rows, h * dh:(h + 1) * dh] = o.astype(ctx_ref.dtype)


def _stage_split_attention_qk8(qi, ki, v, ctx_ref, *, rows, d: int,
                               dh: int, num_heads: int, na: int, cs,
                               quantize_out: bool = False,
                               skip_max: bool = False,
                               cpv=None, cpl=None):
    """int8-score variant of `_stage_split_attention`: q and k arrive
    REQUANTIZED to int8 (static per-tensor scales a_q/a_k folded into the
    qkv dequant by the caller), the score matmuls run int8 x int8 -> int32
    on the MXU (~2x the bf16 rate at these shapes), and `cs` =
    a_q·a_k·head_scale·log2(e) dequantizes the int32 scores straight into
    the exp2 softmax domain. The key-split last key goes through the same
    int8 values cast f32 so both sides of the split share one scale. v
    stays bf16 (same PV matmul as the bf16 core; int8 P would need the
    max-shift back to bound p <= 1 — see docs/DESIGN.md).

    `v` is a separate (M, d) slab (NOT the k|v column block): with k int8
    and v bf16 the two no longer share a dtype/layout.

    `cpv`/`cpl` given = int8-PV mode: v arrives int8 in a_v units, the
    per-row max-shift is forced back (so the shifted probabilities bound
    at 1 and quantize to 127ths), P@V runs int8 x int8 -> int32, and
    cpv = a_v/(127·a_ctx), cpl = a_v/a_ctx dequantize the matmul and the
    f32 last-key term into a_ctx context units."""
    pv8 = cpv is not None
    ss, sbs = [], []
    for h in range(num_heads):          # stage 1: int8 score matmuls
        q = qi[rows, h * dh:(h + 1) * dh]
        k = ki[rows, h * dh:(h + 1) * dh]
        si = jax.lax.dot_general(       # (NP, na) int32
            q, k[:na], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        ss.append(si.astype(jnp.float32) * cs)
        sbs.append(jnp.sum(
            q.astype(jnp.float32) * k[na:na + 1].astype(jnp.float32),
            axis=-1, keepdims=True) * cs)
    ps, pbs, zs = [], [], []
    for h in range(num_heads):          # stage 2: all softmaxes (VPU)
        if skip_max and not pv8:
            p = jnp.exp2(jnp.minimum(ss[h], 100.0))
            pb = jnp.exp2(jnp.minimum(sbs[h], 100.0))
        else:
            mx = jnp.maximum(jnp.max(ss[h], axis=-1, keepdims=True), sbs[h])
            p = jnp.exp2(ss[h] - mx)
            pb = jnp.exp2(sbs[h] - mx)
        zs.append(jnp.sum(p, axis=-1, keepdims=True) + pb)
        ps.append(jnp.round(p * 127.0).astype(jnp.int8) if pv8 else p)
        pbs.append(pb)
    for h in range(num_heads):          # stage 3: all pv matmuls
        vh = v[rows, h * dh:(h + 1) * dh]
        if pv8:
            ci = jax.lax.dot(ps[h], vh[:na],
                             preferred_element_type=jnp.int32)
            o = (ci.astype(jnp.float32) * cpv
                 + (pbs[h] * cpl) * vh[na:na + 1].astype(jnp.float32)
                 ) / zs[h]
        else:
            o = jnp.dot(ps[h].astype(vh.dtype), vh[:na],
                        preferred_element_type=jnp.float32)
            o = (o + pbs[h] * vh[na:na + 1].astype(jnp.float32)) / zs[h]
        if quantize_out:
            o = jnp.clip(jnp.round(o), -127, 127)
        ctx_ref[rows, h * dh:(h + 1) * dh] = o.astype(ctx_ref.dtype)


def _pack_group(num_heads: int, dh: int) -> int:
    """Head-group size for the lane-packed TRAINING cores: g = 128/dh
    heads ride one core matmul (geovpr/ops/lane_pack.py; ViT-B dh=64 ->
    pairs). Serving forwards stay per-head — packing them measured slower
    on the Swin kernels (no stored planes to amortize the operand
    assembly), the same regime as the ViT serving forward."""
    if not _PACKED_TRAIN or 128 % dh != 0:
        return 1
    g = 128 // dh
    return g if g > 1 and num_heads % g == 0 else 1


def _packed_stage_split_attention(qf, kv, ctx_ref, *, rows, d: int,
                                  dh: int, num_heads: int, g: int, na: int):
    """Lane-packed key-split attention core (TRAIN forward): g = 128/dh
    heads per matmul via block-diagonal operands (lane_pack module
    docstring). Keeps the training contract of `_stage_split_attention`
    with skip_max=False: per-band max-shift (including the VPU last key)
    so the saved residuals match the backward's recompute."""
    bmask = _lp.band_mask(g, na, dh)
    ng = num_heads // g
    ss, sbs = [], []
    for gi in range(ng):                # stage 1: packed score matmuls
        lanes = slice(gi * 128, (gi + 1) * 128)
        q = qf[rows, lanes]
        k = kv[rows, lanes]
        ss.append(jax.lax.dot_general(  # (NP, g*na) f32, log2 domain
            q, _lp.block_diag(k[:na], g, bmask), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        sbs.append(q.astype(jnp.float32)
                   * k[na:na + 1].astype(jnp.float32))
    ps, pbs, zs = [], [], []
    for gi in range(ng):                # stage 2: per-band softmaxes (VPU)
        s = ss[gi]
        rows_n = s.shape[0]
        sbh = [jnp.sum(sbs[gi][:, j * dh:(j + 1) * dh], axis=-1,
                       keepdims=True) for j in range(g)]
        mx = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.maximum(jnp.max(s[:, j * na:(j + 1) * na], axis=-1,
                                    keepdims=True), sbh[j]),
                (rows_n, na)) for j in range(g)], axis=1)
        p = jnp.exp2(s - mx)
        pb = [jnp.exp2(sbh[j] - mx[:, j * na:j * na + 1])
              for j in range(g)]
        z = [jnp.sum(p[:, j * na:(j + 1) * na], axis=-1, keepdims=True)
             + pb[j] for j in range(g)]
        ps.append(p)
        pbs.append(pb)
        zs.append(z)
    for gi in range(ng):                # stage 3: packed pv matmuls
        lanes = slice(gi * 128, (gi + 1) * 128)
        v = kv[rows, d + gi * 128:d + (gi + 1) * 128]
        o = jnp.dot(ps[gi].astype(v.dtype), _lp.block_diag(v[:na], g, bmask),
                    preferred_element_type=jnp.float32)
        rows_n = o.shape[0]
        pb_cat = jnp.concatenate(
            [jnp.broadcast_to(pbs[gi][j], (rows_n, dh)) for j in range(g)],
            axis=1)
        zr_cat = jnp.concatenate(
            [jnp.broadcast_to(1.0 / zs[gi][j], (rows_n, dh))
             for j in range(g)], axis=1)
        o = (o + pb_cat * v[na:na + 1].astype(jnp.float32)) * zr_cat
        ctx_ref[rows, lanes] = o.astype(ctx_ref.dtype)


def _packed_masked_bwd_core(qkv, da, dqkv_ref, *, rows, d: int, dh: int,
                            num_heads: int, g: int, np_: int, n_valid: int,
                            scale: float):
    """Lane-packed attention-core backward (masked/(NP, g*NP) planes —
    the recompute contract of `_attn_bwd_kernel_v3`): per head group, ONE
    matmul each for the score recompute, dP, and dq; dk/dv via the
    full-product trick (contract over rows, keep the g diagonal (NP, dh)
    bands — no operand assembly, lane-dim concatenate only, which Mosaic
    lowers fine; the REJECTED sublane concatenate was the key-split
    variant's). `da` may be a VMEM ref or an in-register array."""
    bmask = _lp.band_mask(g, np_, dh)
    colmod = (jax.lax.broadcasted_iota(jnp.int32, (np_, g * np_), 1)
              % np_)
    key_mask = colmod < n_valid
    ng = num_heads // g
    for gi in range(ng):
        lanes = slice(gi * 128, (gi + 1) * 128)
        q = qkv[rows, lanes]
        k = qkv[rows, d + gi * 128:d + (gi + 1) * 128]
        v = qkv[rows, 2 * d + gi * 128:2 * d + (gi + 1) * 128]
        da_g = da[rows, lanes]
        k_blk = _lp.block_diag(k, g, bmask)
        s = jax.lax.dot_general(        # recompute scores, (NP, g*NP)
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.where(key_mask, s * scale, -1e30)
        s = s - _lp.per_band(s, np_, g,
                             lambda b: jnp.max(b, axis=-1, keepdims=True))
        p = jnp.exp(s)
        p = p * (1.0 / _lp.per_band(
            p, np_, g, lambda b: jnp.sum(b, axis=-1, keepdims=True)))
        dp = jax.lax.dot_general(
            da_g, _lp.block_diag(v, g, bmask), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sub = _lp.per_band(dp * p, np_, g,
                           lambda b: jnp.sum(b, axis=-1, keepdims=True))
        ds = p * (dp - sub)
        ds_b = (ds * scale).astype(qkv.dtype)
        p_b = p.astype(qkv.dtype)
        dq = jnp.dot(ds_b, k_blk, preferred_element_type=jnp.float32)
        r_k = jax.lax.dot_general(
            ds_b, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r_v = jax.lax.dot_general(
            p_b, da_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jnp.concatenate(
            [r_k[j * np_:(j + 1) * np_, j * dh:(j + 1) * dh]
             for j in range(g)], axis=1)
        dv = jnp.concatenate(
            [r_v[j * np_:(j + 1) * np_, j * dh:(j + 1) * dh]
             for j in range(g)], axis=1)
        dqkv_ref[rows, lanes] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[rows, d + gi * 128:d + (gi + 1) * 128] = (
            dk.astype(dqkv_ref.dtype))
        dqkv_ref[rows, 2 * d + gi * 128:2 * d + (gi + 1) * 128] = (
            dv.astype(dqkv_ref.dtype))


def _mhsa_kernel(x_ref, ln_scale_ref, ln_bias_ref, wqkv_ref, bqkv_ref,
                 wo_ref, bo_ref, gamma_ref, o_ref, ctx_ref,
                 *, num_heads: int, scale: float, n_valid: int, bb: int,
                 ln_eps: float):
    m, d = x_ref.shape            # (bb*NP, D)
    np_ = m // bb
    dh = d // num_heads

    # fused pre-LayerNorm (norm1) — stays in VMEM instead of a separate
    # bandwidth-bound HBM pass
    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale_ref[:].astype(jnp.float32)
         + ln_bias_ref[:].astype(jnp.float32)).astype(x_raw.dtype)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (M, 3D)

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    key_mask = col < n_valid

    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        for h in range(num_heads):
            # bf16 inputs with f32 accumulation — the MXU truncates to bf16
            # anyway (measured bit-identical), and f32 operands cost extra
            # passes
            q = qkv[rows, h * dh:(h + 1) * dh]
            k = qkv[rows, d + h * dh:d + (h + 1) * dh]
            v = qkv[rows, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            ctx_ref[rows, h * dh:(h + 1) * dh] = o.astype(ctx_ref.dtype)

    out = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    # fused LayerScale (DINOv2 ls1) + residual add
    out = out * gamma_ref[:].astype(jnp.float32) + x_raw.astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _mhsa_kernel_v3(x_ref, ln_scale_ref, ln_bias_ref, wqkv_ref, bqkv_ref,
                    wo_ref, bo_ref, gamma_ref, o_ref, ctx_ref,
                    *, num_heads: int, n_valid: int, bb: int, ln_eps: float):
    """Inference fast path for n_valid = 128k + 1 (ViT-B/14 at 224: 256
    patches + CLS = 257). Four measured wins over the masked kernel,
    3.96 -> 3.03 ms/layer at B=256 N=257 D=768 H=12 on v5e (intermediate
    checkpoints: 3.40 after the first three, in the process that measured
    the 3.96 baseline; the stage-split ablation in a fresh process read
    3.55 -> 3.03 — run-to-run process variance is ~4%):

    - **key-split**: keys/values 0..n-2 go through exactly lane-aligned
      (256-wide) MXU matmuls; the single remaining key is handled with VPU
      ops (one multiply + lane-reduce per head). Padded rows beyond n_valid
      never enter the attention at all, so the (N,N) mask, the -1e30
      select, and the third 128-lane tile of both attention matmuls
      disappear.
    - **exp2-domain softmax**: the softmax scale and log2(e) are folded
      into the q columns right after the qkv matmul (one fused f32
      multiply), so the kernel computes exp2 directly — Mosaic lowers exp
      as exp2 anyway; this removes the explicit scale pass.
    - **deferred normalization** (flash-attention style): the row-sum z is
      taken from the f32 probabilities and division happens on the (N, dh)
      context instead of the (N, N) probability matrix.
    - **stage-split head loop** (bit-identical output): the per-head work
      is issued as three unrolled passes — all
      score matmuls, then all softmaxes, then all pv matmuls — instead of
      one fused loop. The per-head chains are independent, so the split
      hands Mosaic's scheduler 12 dependency-free MXU ops followed by 12
      VPU chains followed by 12 MXU ops, and the MXU/VPU phases of
      different heads overlap instead of serializing head-by-head. Costs
      VMEM for the 12 live (NP, na) f32 score/probability buffers per
      element — needs `vmem_limit_bytes` raised past the 16 MB default at
      bb=2 (set at the pallas_call to the measured e2e optimum, 28 MB;
      see the dispatch comment in _fused_mhsa_pallas).

    Numerics: max |out - f32 oracle| at production shapes is 0.0087 vs
    0.0079 for both the masked kernel and the XLA bf16 path — i.e. within
    bf16 rounding noise (the ones-column rowsum-via-matmul variant was
    measured numerically WRONG on hardware and is deliberately absent; a
    row-sum via a separate p @ ones(256,128) MXU matmul was measured
    SLOWER, 3.69 ms/layer, and numerically worse).
    """
    m, d = x_ref.shape
    np_ = m // bb
    dh = d // num_heads
    na = n_valid - 1          # multiple of 128 by dispatch condition

    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale_ref[:].astype(jnp.float32)
         + ln_bias_ref[:].astype(jnp.float32)).astype(x_raw.dtype)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    # fold attention scale + exp->exp2 change of base into q while f32
    # (folding into the bf16 *weights* would re-round them: measured 40x
    # worse max error)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * d), 1)
    srow = jnp.where(col3 < d, dh ** -0.5 * _LOG2E, 1.0)
    qkv = ((qkv + bqkv_ref[:].astype(jnp.float32)) * srow).astype(x.dtype)

    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        _stage_split_attention(qkv[:, :d], qkv[:, d:], ctx_ref, rows=rows,
                               d=d, dh=dh, num_heads=num_heads, na=na)

    out = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out * gamma_ref[:].astype(jnp.float32) + x_raw.astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _mhsa_kernel_v3_int8(x_ref, ln_scale_ref, ln_bias_ref, wqkv_q_ref,
                         sqkv_ref, bqkv_ref, wo_q_ref, so_ref, bo_ref,
                         gamma_ref, cs_ref, o_ref, ctx_ref,
                         *, num_heads: int, n_valid: int, bb: int,
                         ln_eps: float, qk8: bool, pv8: bool = False):
    """w8a8 serving variant of `_mhsa_kernel_v3`: the qkv and out
    projections run int8 x int8 -> int32 on the MXU (slope-measured 363.7
    vs bf16's 176.4 TOP/s at these exact shapes); the attention core stays
    bf16. Static activation scales are pre-folded by the caller
    (`fused_mhsa_block_int8`):

    - 1/a_x into the LN scale/bias, so the post-LN quantize is just
      round/clip/cast;
    - a_x * per-column weight scale into `sqkv`, with the v third further
      scaled by 1/a_ctx so the attention context comes out of the pv
      matmuls already in quantized units (one round/clip, no multiply);
    - a_ctx * wo column scale into `so`.

    ctx scratch is int8 (feeds the second int8 matmul directly).
    """
    m, d = x_ref.shape
    np_ = m // bb
    dh = d // num_heads
    na = n_valid - 1

    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
    xq = jnp.clip(jnp.round(normed * ln_scale_ref[:].astype(jnp.float32)
                            + ln_bias_ref[:].astype(jnp.float32)),
                  -127, 127).astype(jnp.int8)

    yi = jax.lax.dot(xq, wqkv_q_ref[:], preferred_element_type=jnp.int32)
    if qk8:
        # q/k thirds arrive in a_q/a_k quantized units (fold:
        # DinoV2Block._attn_int8_fold) — no srow: the head scale and
        # log2(e) ride the score-dequant constant cs instead
        qkv_f = yi.astype(jnp.float32) * sqkv_ref[:] + bqkv_ref[:]
        qi = jnp.clip(jnp.round(qkv_f[:, :d]), -127, 127).astype(jnp.int8)
        ki = jnp.clip(jnp.round(qkv_f[:, d:2 * d]), -127,
                      127).astype(jnp.int8)
        if pv8:     # v arrives in a_v units (fold) -> int8
            v = jnp.clip(jnp.round(qkv_f[:, 2 * d:]), -127,
                         127).astype(jnp.int8)
            cpv, cpl = cs_ref[1], cs_ref[2]
        else:
            v = qkv_f[:, 2 * d:].astype(jnp.bfloat16)
            cpv = cpl = None
        cs = cs_ref[0]
        for e in range(bb):
            rows = slice(e * np_, (e + 1) * np_)
            _stage_split_attention_qk8(qi, ki, v, ctx_ref, rows=rows, d=d,
                                       dh=dh, num_heads=num_heads, na=na,
                                       cs=cs, quantize_out=True,
                                       skip_max=_SKIP_MAX,
                                       cpv=cpv, cpl=cpl)
    else:
        col3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * d), 1)
        srow = jnp.where(col3 < d, dh ** -0.5 * _LOG2E, 1.0)
        qkv = ((yi.astype(jnp.float32) * sqkv_ref[:]
                + bqkv_ref[:]) * srow).astype(jnp.bfloat16)

        for e in range(bb):
            rows = slice(e * np_, (e + 1) * np_)
            _stage_split_attention(qkv[:, :d], qkv[:, d:], ctx_ref,
                                   rows=rows, d=d, dh=dh,
                                   num_heads=num_heads, na=na,
                                   quantize_out=True, skip_max=_SKIP_MAX)

    yo = jax.lax.dot(ctx_ref[:], wo_q_ref[:],
                     preferred_element_type=jnp.int32)
    out = yo.astype(jnp.float32) * so_ref[:] + bo_ref[:].astype(jnp.float32)
    out = out * gamma_ref[:].astype(jnp.float32) + xf
    o_ref[:] = out.astype(o_ref.dtype)


def fused_mhsa_block_int8(x: jax.Array, ln_scale_q: jax.Array,
                          ln_bias_q: jax.Array, wqkv_q: jax.Array,
                          sqkv_eff: jax.Array, bqkv_eff: jax.Array,
                          wo_q: jax.Array, so_eff: jax.Array, bo: jax.Array,
                          gamma: jax.Array, num_heads: int,
                          block_batch: int = 2, ln_eps: float = 1e-6,
                          n_valid: int | None = None,
                          cs: jax.Array | None = None,
                          cpv: jax.Array | None = None,
                          cpl: jax.Array | None = None) -> jax.Array | None:
    """Serving-only (no VJP) w8a8 fused attention block. Arguments carry
    PRE-FOLDED static scales — see `_mhsa_kernel_v3_int8` and the fold in
    `geovpr/models/dinov2.py` (DinoV2Block). Returns None when the v3
    fast-path conditions don't hold (caller falls back to the XLA int8
    path); only the key-split layout is worth quantizing.

    `cs`: int8-score mode (INT8_QK_SCORES) — the scalar score-dequant
    constant a_q·a_k·head_scale·log2(e); requires sqkv_eff/bqkv_eff folded
    with the 1/a_q / 1/a_k thirds. None = bf16 score matmuls.
    `cpv`/`cpl`: int8-PV mode on top (INT8_PV; v third folded 1/a_v):
    cpv = a_v/(127·a_ctx), cpl = a_v/a_ctx.

    `n_valid`: resident-padding mode — the caller keeps the token stream
    padded to the sublane quantum across the whole serving stack (the
    per-layer pad/slice copies around this kernel measured ~3.3 ms of the
    B=256 batch). x then arrives (B, ceil16(n_valid), D) and is returned
    at the same padded shape; only the first n_valid rows are meaningful.
    """
    b, n, d = x.shape
    if n_valid is not None:
        if n != -(-n_valid // 16) * 16:
            raise ValueError(f"resident padding: got {n} rows for "
                             f"n_valid={n_valid}")
        np_, n = n, n_valid
    else:
        np_ = -(-n // 16) * 16
    bb = block_batch
    while b % bb != 0:
        bb //= 2
    compiler_params = _v3_fast_path(n, np_, num_heads, bb, n - 1,
                                    jnp.bfloat16)
    if compiler_params is None:
        return None
    if np_ != n and n_valid is None:
        x = jnp.pad(x, [(0, 0), (0, np_ - n), (0, 0)])
    xf = x.reshape(b * np_, d)

    kernel = functools.partial(_mhsa_kernel_v3_int8, num_heads=num_heads,
                               n_valid=n, bb=bb, ln_eps=ln_eps,
                               qk8=cs is not None, pv8=cpv is not None)
    parts = [jnp.float32(0.0) if c is None else c.astype(jnp.float32)
             for c in (cs, cpv, cpl, None)]
    cs_arr = jnp.stack([jnp.reshape(c, ()) for c in parts])
    whole = lambda i: (0, 0)
    vec = lambda i: (0,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * np_, d), x.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((4,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bb * np_, d), jnp.int8)],
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * d * 4 * d
            + 4 * b * num_heads * np_ * np_ * (d // num_heads),
            bytes_accessed=2 * b * np_ * d * x.dtype.itemsize,
            transcendentals=b * num_heads * np_ * np_),
    )(xf, ln_scale_q, ln_bias_q, wqkv_q, sqkv_eff, bqkv_eff, wo_q, so_eff,
      bo, gamma, cs_arr)
    out = out.reshape(b, np_, d)
    if n_valid is not None:
        return jax.lax.stop_gradient(out)     # stays resident-padded
    return jax.lax.stop_gradient(out[:, :n, :] if np_ != n else out)


def _mhsa_train_kernel(x_ref, ln_scale_ref, ln_bias_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bo_ref, gamma_ref, o_ref, qkv_ref, ctx_ref,
                       *, num_heads: int, scale: float, n_valid: int, bb: int,
                       ln_eps: float):
    """Forward kernel variant for training: additionally materializes the
    qkv projections and per-head attention context (`ctx`) to HBM as
    residuals for the structured backward — the N^2 score/probability
    matrices still never leave VMEM."""
    m, d = x_ref.shape
    np_ = m // bb
    dh = d // num_heads

    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale_ref[:].astype(jnp.float32)
         + ln_bias_ref[:].astype(jnp.float32)).astype(x_raw.dtype)

    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    qkv_ref[:] = qkv

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    key_mask = col < n_valid

    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        for h in range(num_heads):
            q = qkv[rows, h * dh:(h + 1) * dh]
            k = qkv[rows, d + h * dh:d + (h + 1) * dh]
            v = qkv[rows, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            ctx_ref[rows, h * dh:(h + 1) * dh] = o.astype(ctx_ref.dtype)

    out = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out * gamma_ref[:].astype(jnp.float32) + x_raw.astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _mhsa_train_kernel_v3(x_ref, ln_scale_ref, ln_bias_ref, wqkv_ref,
                          bqkv_ref, wo_ref, bo_ref, gamma_ref, o_ref,
                          qkv_ref, ctx_ref,
                          *, num_heads: int, n_valid: int, bb: int,
                          ln_eps: float, g: int = 1):
    """Training-forward fast path for n_valid = 128k+1: key-split + exp2
    softmax + deferred normalization + stage-split head loop, exactly as
    `_mhsa_kernel_v3`, but additionally materializing the qkv projections
    and attention context to HBM for the structured backward. The SAVED
    qkv is the plain post-bias projection (no scale/log2e folding) so the
    backward contract is identical to the masked path; the fold is applied
    to a kernel-local copy of q only. `g` > 1 runs the lane-packed core
    (train-only, see _pack_group)."""
    m, d = x_ref.shape
    np_ = m // bb
    dh = d // num_heads
    na = n_valid - 1

    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale_ref[:].astype(jnp.float32)
         + ln_bias_ref[:].astype(jnp.float32)).astype(x_raw.dtype)

    qkvf = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:].astype(jnp.float32))
    qkv = qkvf.astype(x.dtype)
    qkv_ref[:] = qkv
    qf = (qkvf[:, :d] * (dh ** -0.5 * _LOG2E)).astype(x.dtype)

    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        if g > 1:
            _packed_stage_split_attention(qf, qkv[:, d:], ctx_ref,
                                          rows=rows, d=d, dh=dh,
                                          num_heads=num_heads, g=g, na=na)
        else:
            _stage_split_attention(qf, qkv[:, d:], ctx_ref, rows=rows,
                                   d=d, dh=dh, num_heads=num_heads, na=na)

    out = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out * gamma_ref[:].astype(jnp.float32) + x_raw.astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _attn_bwd_kernel_v3(qkv_ref, da_ref, dqkv_ref,
                        *, num_heads: int, scale: float, n_valid: int,
                        bb: int, g: int = 1):
    """Attention-core backward with a stage-split head loop: recompute
    matmuls, then softmax VPU chains, then dP matmuls, then softmax-bwd
    VPU, then the gradient matmuls — so Mosaic overlaps the independent
    per-head MXU and VPU streams (same scheduling win as the forward's
    stage split). Matmul shapes stay masked/(NP,NP) like `_attn_bwd_kernel`:
    a key-split variant (all matmuls lane-aligned at na) was written and
    REJECTED — assembling the (NP, dh) dk/dv blocks from (na,dh)+(1,dh)+
    zero rows needs a sublane-dimension concatenate that Mosaic cannot
    lower ("result/input offset mismatch on non-concat dimension")."""
    m, d3 = qkv_ref.shape
    d = d3 // 3
    np_ = m // bb
    dh = d // num_heads

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    key_mask = col < n_valid

    qkv = qkv_ref[:]
    if g > 1:
        for e in range(bb):
            rows = slice(e * np_, (e + 1) * np_)
            _packed_masked_bwd_core(qkv, da_ref, dqkv_ref, rows=rows, d=d,
                                    dh=dh, num_heads=num_heads, g=g,
                                    np_=np_, n_valid=n_valid, scale=scale)
        return
    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        ss = []
        for h in range(num_heads):          # stage 1: recompute scores
            q = qkv[rows, h * dh:(h + 1) * dh]
            k = qkv[rows, d + h * dh:d + (h + 1) * dh]
            ss.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        pss = []
        for h in range(num_heads):          # stage 2: softmax recompute
            s = jnp.where(key_mask, ss[h] * scale, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            pss.append(p / jnp.sum(p, axis=-1, keepdims=True))
        dps = []
        for h in range(num_heads):          # stage 3: dP matmuls
            v = qkv[rows, 2 * d + h * dh:2 * d + (h + 1) * dh]
            da = da_ref[rows, h * dh:(h + 1) * dh]
            dps.append(jax.lax.dot_general(
                da, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        dss = []
        for h in range(num_heads):          # stage 4: softmax backward VPU
            p = pss[h]
            ds = p * (dps[h] - jnp.sum(dps[h] * p, axis=-1, keepdims=True))
            dss.append((ds * scale).astype(qkv.dtype))
        for h in range(num_heads):          # stage 5: gradient matmuls
            q = qkv[rows, h * dh:(h + 1) * dh]
            k = qkv[rows, d + h * dh:d + (h + 1) * dh]
            da = da_ref[rows, h * dh:(h + 1) * dh]
            pb = pss[h].astype(qkv.dtype)
            dv = jax.lax.dot_general(
                pb, da, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = jnp.dot(dss[h], k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dss[h], q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[rows, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[rows, d + h * dh:d + (h + 1) * dh] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[rows, 2 * d + h * dh:2 * d + (h + 1) * dh] = (
                dv.astype(dqkv_ref.dtype))


def _attn_bwd_kernel(qkv_ref, da_ref, dqkv_ref,
                     *, num_heads: int, scale: float, n_valid: int, bb: int):
    """Attention-core backward: given saved qkv and da = dL/d(ctx), emit
    dqkv. Recomputes softmax probabilities per head in VMEM (cheap: one
    (N, dh) x (dh, N) matmul + exp) — the alternative, stashing (B, H, N, N)
    probabilities to HBM, is exactly the bandwidth bill this kernel exists
    to avoid."""
    m, d3 = qkv_ref.shape
    d = d3 // 3
    np_ = m // bb
    dh = d // num_heads

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    key_mask = col < n_valid

    qkv = qkv_ref[:]
    for e in range(bb):
        rows = slice(e * np_, (e + 1) * np_)
        for h in range(num_heads):
            q = qkv[rows, h * dh:(h + 1) * dh]
            k = qkv[rows, d + h * dh:d + (h + 1) * dh]
            v = qkv[rows, 2 * d + h * dh:2 * d + (h + 1) * dh]
            da = da_ref[rows, h * dh:(h + 1) * dh]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pb = p.astype(qkv.dtype)

            # dv = p^T @ da ; dp = da @ v^T
            dv = jax.lax.dot_general(
                pb, da, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                da, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # softmax backward: ds = p * (dp - sum(dp * p, axis=-1))
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(qkv.dtype)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            dqkv_ref[rows, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[rows, d + h * dh:d + (h + 1) * dh] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[rows, 2 * d + h * dh:2 * d + (h + 1) * dh] = (
                dv.astype(dqkv_ref.dtype))


def _mhsa_block_xla(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma,
                    num_heads: int, ln_eps: float):
    """jnp reference of the fused block — the numeric oracle the kernel
    (and its structured backward) are tested against. NOT on any production
    path: the training backward runs _attn_bwd_pallas + explicit XLA
    matmuls, not a VJP of this function."""
    b, n, d = x.shape
    dh = d // num_heads
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    qkv = (jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k),
                   preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), heads(v),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = (jnp.dot(o.astype(x.dtype), wo,
                   preferred_element_type=jnp.float32)
           + bo.astype(jnp.float32))
    return (out * gamma.astype(jnp.float32) + xf).astype(x.dtype)


def fused_mhsa_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                     wqkv: jax.Array, bqkv: jax.Array,
                     wo: jax.Array, bo: jax.Array, gamma: jax.Array,
                     num_heads: int, block_batch: int = 2,
                     ln_eps: float = 1e-6,
                     n_valid: int | None = None) -> jax.Array:
    """Fused pre-LN attention block:
        out = x + gamma * MHSA(LN(x)) @ Wo
    x: (B, N, D). wqkv: (D, 3D) with q|k|v column blocks; wo: (D, D);
    gamma: (D,) LayerScale (pass ones for plain ViT).

    Differentiable with a STRUCTURED backward: the forward (when
    differentiated) saves the qkv projections and attention context as
    residuals; the backward runs a Pallas attention-core kernel for dqkv
    (probabilities recomputed in VMEM, N^2 never hits HBM) plus plain XLA
    matmuls for the weight gradients and an exact LayerNorm VJP.

    `n_valid`: resident-padding SERVING mode (see fused_mhsa_block_int8):
    x arrives and is returned padded to ceil16(n_valid) rows; routes
    through the no-VJP forward under stop_gradient.
    """
    if n_valid is not None:
        return jax.lax.stop_gradient(_fused_mhsa_pallas(
            x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma,
            num_heads=num_heads, block_batch=block_batch, ln_eps=ln_eps,
            n_valid=n_valid))

    @jax.custom_vjp
    def run(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma):
        return _fused_mhsa_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                                  gamma, num_heads=num_heads,
                                  block_batch=block_batch, ln_eps=ln_eps)

    def fwd(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma):
        out, qkv, ctx = _fused_mhsa_pallas_train(
            x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma,
            num_heads=num_heads, block_batch=block_batch, ln_eps=ln_eps)
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma, qkv,
                     ctx)

    def bwd(res, g):
        x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma, qkv, ctx = res
        b, n, d = x.shape
        np_ = -(-n // 16) * 16

        if _BWD_ALL and _bwd_all_ok(np_, d, num_heads, x.dtype):
            # all-in-one backward kernel: one pass over the residual
            # streams, every weight grad accumulated in VMEM (see
            # _mhsa_bwd_all_kernel)
            gp = g if np_ == n else jnp.pad(g, [(0, 0), (0, np_ - n),
                                                (0, 0)])
            xp = x if np_ == n else jnp.pad(x, [(0, 0), (0, np_ - n),
                                                (0, 0)])
            (dx, dwqkv, dbqkv, dwo, dbo, dgamma, dls, dlb
             ) = _mhsa_bwd_all_pallas(
                xp.reshape(b * np_, d), qkv, ctx,
                gp.reshape(b * np_, d).astype(x.dtype),
                wqkv, wo, bo, gamma, ln_scale, ln_bias,
                num_heads, n, np_, ln_eps)
            dx = dx.reshape(b, np_, d)[:, :n, :]
            return (dx.astype(x.dtype), dls.reshape(d).astype(ln_scale.dtype),
                    dlb.reshape(d).astype(ln_bias.dtype),
                    dwqkv.astype(wqkv.dtype),
                    dbqkv.reshape(3 * d).astype(bqkv.dtype),
                    dwo.astype(wo.dtype), dbo.reshape(d).astype(bo.dtype),
                    dgamma.reshape(d).astype(gamma.dtype))

        gf = g.astype(jnp.float32)
        if np_ != n:
            gf = jnp.pad(gf, [(0, 0), (0, np_ - n), (0, 0)])
        gf = gf.reshape(b * np_, d)

        # out = x + gamma * (ctx @ wo + bo)
        dy = gf * gamma.astype(jnp.float32)                     # (M, D)
        dyb = dy.astype(x.dtype)
        da = jnp.dot(dyb, wo.T, preferred_element_type=jnp.float32
                     ).astype(x.dtype)
        dqkv = _attn_bwd_pallas(qkv, da, num_heads=num_heads,
                                block_batch=block_batch, n_valid=n, bb_rows=np_)

        y = (jnp.dot(ctx, wo, preferred_element_type=jnp.float32)
             + bo.astype(jnp.float32))
        dgamma = jnp.sum(gf * y, axis=0).astype(gamma.dtype)
        dwo = jnp.dot(ctx.T, dyb,
                      preferred_element_type=jnp.float32).astype(wo.dtype)
        dbo = jnp.sum(dy, axis=0).astype(bo.dtype)

        # LN recompute (elementwise — no matmuls) + exact VJP
        xp = x if np_ == n else jnp.pad(x, [(0, 0), (0, np_ - n), (0, 0)])
        xp = xp.reshape(b * np_, d)

        def ln_f(xx, s, bias):
            xf = xx.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + ln_eps)
                    * s.astype(jnp.float32)
                    + bias.astype(jnp.float32)).astype(xx.dtype)

        h, ln_vjp = jax.vjp(ln_f, xp, ln_scale, ln_bias)
        dwqkv = jnp.dot(h.T, dqkv,
                        preferred_element_type=jnp.float32).astype(wqkv.dtype)
        dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0).astype(bqkv.dtype)
        dh = jnp.dot(dqkv, wqkv.T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
        dx_ln, dls, dlb = ln_vjp(dh)

        dx = (gf + dx_ln.astype(jnp.float32)).reshape(b, np_, d)[:, :n, :]
        return (dx.astype(x.dtype), dls, dlb, dwqkv, dbqkv, dwo, dbo, dgamma)

    run.defvjp(fwd, bwd)
    return run(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma)


def _fused_mhsa_pallas(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                       wqkv: jax.Array, bqkv: jax.Array,
                       wo: jax.Array, bo: jax.Array, gamma: jax.Array,
                       num_heads: int, block_batch: int = 2,
                       ln_eps: float = 1e-6,
                       n_valid: int | None = None) -> jax.Array:
    b, n, d = x.shape
    dh = d // num_heads
    scale = dh ** -0.5
    # pad rows only to the sublane quantum (16 for bf16) — padding to a full
    # 128 lane tile costs 1.4x extra projection FLOPs and 2.2x extra
    # attention FLOPs at ViT N=257 (384 vs 272 rows); Mosaic handles
    # non-128 row counts fine since N is the *sublane* dim of every matmul.
    # In resident mode (n_valid) x arrives already padded and is returned
    # padded — the caller owns the single pad/slice pair.
    if n_valid is not None:
        if n != -(-n_valid // 16) * 16:
            raise ValueError(f"resident padding: got {n} rows for "
                             f"n_valid={n_valid}")
        np_, n = n, n_valid
    else:
        np_ = -(-n // 16) * 16
        if np_ != n:
            x = jnp.pad(x, [(0, 0), (0, np_ - n), (0, 0)])
    bb = block_batch
    while b % bb != 0:
        bb //= 2
    xf = x.reshape(b * np_, d)

    grid = (b // bb,)
    # key-split + stage-split fast path when eligible (see _v3_fast_path
    # for the gating conditions and the VMEM-limit rationale); everything
    # else takes the generic masked kernel
    compiler_params = _v3_fast_path(n, np_, num_heads, bb, n - 1, x.dtype)
    if compiler_params is not None:
        kernel = functools.partial(_mhsa_kernel_v3, num_heads=num_heads,
                                   n_valid=n, bb=bb, ln_eps=ln_eps)
    else:
        kernel = functools.partial(_mhsa_kernel, num_heads=num_heads,
                                   scale=scale, n_valid=n, bb=bb,
                                   ln_eps=ln_eps)
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_MASKED_VMEM_LIMIT)
    whole = lambda i: (0, 0)
    vec = lambda i: (0,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * np_, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bb * np_, d), x.dtype)],
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * d * 4 * d + 4 * b * num_heads * np_ * np_ * dh,
            bytes_accessed=2 * b * np_ * d * x.dtype.itemsize,
            transcendentals=b * num_heads * np_ * np_),
    )(xf, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma)
    out = out.reshape(b, np_, d)
    if n_valid is not None:
        return out      # stays resident-padded
    return out[:, :n, :] if np_ != n else out


def _fused_mhsa_pallas_train(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma,
                             num_heads: int, block_batch: int = 2,
                             ln_eps: float = 1e-6):
    """Training forward: returns (out (B,N,D), qkv (B*NP,3D), ctx (B*NP,D))
    with qkv/ctx kept flat+padded — they are internal residuals consumed by
    the structured backward, never user-facing."""
    b, n, d = x.shape
    dh = d // num_heads
    scale = dh ** -0.5
    np_ = -(-n // 16) * 16
    if np_ != n:
        x = jnp.pad(x, [(0, 0), (0, np_ - n), (0, 0)])
    # bb=1: the extra qkv/ctx output blocks push bb=2 past the 16MB VMEM
    # scope (measured 18.9MB)
    bb = 1
    xf = x.reshape(b * np_, d)

    grid = (b // bb,)
    # same fast-path gate as inference (the saved qkv residual is identical
    # either way, so fwd/bwd kernels may mix freely)
    compiler_params = _v3_fast_path(n, np_, num_heads, bb, n - 1, x.dtype)
    if compiler_params is not None:
        kernel = functools.partial(_mhsa_train_kernel_v3,
                                   num_heads=num_heads, n_valid=n, bb=bb,
                                   ln_eps=ln_eps,
                                   g=_pack_group(num_heads, dh))
    else:
        kernel = functools.partial(_mhsa_train_kernel, num_heads=num_heads,
                                   scale=scale, n_valid=n, bb=bb,
                                   ln_eps=ln_eps)
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_MASKED_VMEM_LIMIT)
    whole = lambda i: (0, 0)
    vec = lambda i: (0,)
    out, qkv, ctx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * np_, d), x.dtype),
            jax.ShapeDtypeStruct((b * np_, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b * np_, d), x.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * np_, 3 * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * d * 4 * d + 4 * b * num_heads * np_ * np_ * dh,
            bytes_accessed=7 * b * np_ * d * x.dtype.itemsize,
            transcendentals=b * num_heads * np_ * np_),
    )(xf, ln_scale, ln_bias, wqkv, bqkv, wo, bo, gamma)
    out = out.reshape(b, np_, d)
    return (out[:, :n, :] if np_ != n else out), qkv, ctx


def _attn_bwd_pallas(qkv: jax.Array, da: jax.Array, num_heads: int,
                     block_batch: int, n_valid: int,
                     bb_rows: int) -> jax.Array:
    """dqkv from saved qkv and da = dL/d(ctx); flat (B*NP, .) layout."""
    m, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    scale = dh ** -0.5
    np_ = bb_rows
    b = m // np_
    bb = 1   # bb=2 exceeds the 16MB VMEM scope (measured 19MB)

    grid = (b // bb,)
    # width = np_ here: the backward keeps masked (NP, NP) score planes
    compiler_params = _v3_fast_path(n_valid, np_, num_heads, bb, np_,
                                    qkv.dtype)
    if compiler_params is not None:
        kernel = functools.partial(
            _attn_bwd_kernel_v3, num_heads=num_heads, scale=scale,
            n_valid=n_valid, bb=bb, g=_pack_group(num_heads, dh))
    else:
        kernel = functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                                   scale=scale, n_valid=n_valid, bb=bb)
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_MASKED_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, d3), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb * np_, d3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * np_, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb * np_, d3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=10 * (m // np_) * num_heads * np_ * np_ * dh,
            bytes_accessed=2 * m * (d3 + d) * qkv.dtype.itemsize,
            transcendentals=(m // np_) * num_heads * np_ * np_),
    )(qkv, da)
    return out


# ------------------------------------------- all-in-one training backward
def _bwd_all_head_chunk(np_: int, num_heads: int) -> int:
    """Heads per recompute chunk in the all-in-one backward: each chunk
    holds ~4 live f32 (NP, NP) planes per head (scores, probabilities, dP,
    dS); the budget keeps them clear of the resident f32 weight-gradient
    accumulators (~9.4 MB at D=768)."""
    budget = _BWD_ALL_PLANES_MB * 1024 * 1024
    for ch in (num_heads, 8, 6, 4, 3, 2, 1):
        if num_heads % ch == 0 and 4 * ch * np_ * np_ * 4 <= budget:
            return ch
    return 1


def _bwd_all_ok(np_: int, d: int, num_heads: int, dtype) -> bool:
    """Eligibility for the all-in-one backward: the f32 dwqkv (D, 3D) +
    dwo (D, D) accumulators stay VMEM-resident across the whole sequential
    grid — that gates it to D <= ~800 (ViT-B D=768 qualifies; large-14
    D=1024 would need ~17 MB of accumulators and falls back to the split
    composition). f32 activations at production scale are rejected for the
    same VMEM-doubling reason as `_v3_fast_path`; tiny test shapes pass."""
    if (d * 3 * d + d * d + 6 * d) * 4 > 11 * 1024 * 1024:
        return False
    if dtype != jnp.bfloat16 and np_ * d * 4 > 512 * 1024:
        return False
    return True


def _mhsa_bwd_all_kernel(x_ref, qkv_ref, ctx_ref, g_ref, wqkv_ref, wo_ref,
                         bo_ref, gamma_ref, ln_scale_ref, ln_bias_ref,
                         dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                         dgamma_ref, dls_ref, dlb_ref, dqkv_scr,
                         *, num_heads: int, scale: float, n_valid: int,
                         ln_eps: float, pg: int = 1):
    """The ENTIRE fused-MHSA-block backward in one kernel (the ViT port of
    pallas_swin_block._train_bwd_all_kernel, which measured -7% on the full
    Swin train step). The split path's XLA composition — dy = g*gamma,
    da = dy@Wo^T, y-recompute for dgamma, dwo = ctx^T@dy, the LN recompute,
    dwqkv = h^T@dqkv, the bias column sums, dh = dqkv@Wqkv^T, and the LN
    VJP — re-reads the token stream and the (M, 3D) dqkv from HBM several
    times each. Here every stream is read ONCE per row block, dqkv lives in
    a VMEM scratch and never reaches HBM, and every weight gradient
    (dwqkv, dbqkv, dwo, dbo, dgamma, dLN-scale, dLN-bias) accumulates in
    VMEM f32 across the sequential grid; dx is the only stream written.

    The attention-core backward recomputes probabilities per head chunk in
    VMEM, masked/(NP, NP)-shaped exactly like `_attn_bwd_kernel_v3` (the
    recompute matches the forward to bf16 noise — same contract as the
    split path). Numerics elsewhere follow the split path's rounding: da
    and dh round to the stream dtype before their consumers."""
    m, d3 = qkv_ref.shape
    d = d3 // 3
    dh_ = d // num_heads
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    g_raw = g_ref[:]
    gf = g_raw.astype(jnp.float32)
    gamma_f = gamma_ref[:].astype(jnp.float32)
    dy = gf * gamma_f
    dyb = dy.astype(g_raw.dtype)

    # out = x + gamma * (ctx @ Wo + bo): out-proj grads + dgamma (needs the
    # y recompute — one extra matmul, same as the split path pays in XLA)
    ctx = ctx_ref[:]
    y = (jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
         + bo_ref[:].astype(jnp.float32))
    dgamma_ref[:] += jnp.sum(gf * y, axis=0, keepdims=True)
    dwo_ref[:] += jax.lax.dot_general(
        ctx, dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbo_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        dyb, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g_raw.dtype)

    # attention core: recompute p per head chunk, dqkv into the VMEM
    # scratch (lane-packed when pg > 1; else stage-split within each head
    # chunk, as _attn_bwd_kernel_v3)
    qkv = qkv_ref[:]
    if pg > 1:
        _packed_masked_bwd_core(qkv, da, dqkv_scr, rows=slice(0, m), d=d,
                                dh=dh_, num_heads=num_heads, g=pg, np_=m,
                                n_valid=n_valid, scale=scale)
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        key_mask = col < n_valid
        ch = _bwd_all_head_chunk(m, num_heads)
        for h0 in range(0, num_heads, ch):
            heads = range(h0, h0 + ch)
            ss = []
            for h in heads:                 # stage 1: recompute scores
                q = qkv[:, h * dh_:(h + 1) * dh_]
                k = qkv[:, d + h * dh_:d + (h + 1) * dh_]
                ss.append(jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            pss = []
            for i, h in enumerate(heads):   # stage 2: softmax recompute
                s = jnp.where(key_mask, ss[i] * scale, -1e30)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                pss.append(p / jnp.sum(p, axis=-1, keepdims=True))
            dps = []
            for i, h in enumerate(heads):   # stage 3: dP matmuls
                v = qkv[:, 2 * d + h * dh_:2 * d + (h + 1) * dh_]
                da_h = da[:, h * dh_:(h + 1) * dh_]
                dps.append(jax.lax.dot_general(
                    da_h, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            dss = []
            for i, h in enumerate(heads):   # stage 4: softmax backward VPU
                p = pss[i]
                ds = p * (dps[i]
                          - jnp.sum(dps[i] * p, axis=-1, keepdims=True))
                dss.append((ds * scale).astype(qkv.dtype))
            for i, h in enumerate(heads):   # stage 5: gradient matmuls
                q = qkv[:, h * dh_:(h + 1) * dh_]
                k = qkv[:, d + h * dh_:d + (h + 1) * dh_]
                da_h = da[:, h * dh_:(h + 1) * dh_]
                pb = pss[i].astype(qkv.dtype)
                dv = jax.lax.dot_general(
                    pb, da_h, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dq = jnp.dot(dss[i], k, preferred_element_type=jnp.float32)
                dk = jax.lax.dot_general(
                    dss[i], q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dqkv_scr[:, h * dh_:(h + 1) * dh_] = (
                    dq.astype(dqkv_scr.dtype))
                dqkv_scr[:, d + h * dh_:d + (h + 1) * dh_] = (
                    dk.astype(dqkv_scr.dtype))
                dqkv_scr[:, 2 * d + h * dh_:2 * d + (h + 1) * dh_] = (
                    dv.astype(dqkv_scr.dtype))

    # LN recompute (f32) + qkv-projection weight grads + LN VJP -> dx
    x_raw = x_ref[:]
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = (xf - mu) * rstd
    ls = ln_scale_ref[:].astype(jnp.float32)
    h_ln = (xhat * ls + ln_bias_ref[:].astype(jnp.float32)
            ).astype(x_raw.dtype)

    dqkv = dqkv_scr[:]
    dwqkv_ref[:] += jax.lax.dot_general(
        h_ln, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dhf = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_raw.dtype
                                                   ).astype(jnp.float32)
    dls_ref[:] += jnp.sum(dhf * xhat, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(dhf, axis=0, keepdims=True)
    dxhat = dhf * ls
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[:] = (dx + gf).astype(dx_ref.dtype)


def _mhsa_bwd_all_pallas(x, qkv, ctx, g, wqkv, wo, bo, gamma, ln_scale,
                         ln_bias, num_heads: int, n_valid: int, np_: int,
                         ln_eps: float):
    """Dispatch the all-in-one backward. All row streams (x, qkv, ctx, g)
    arrive flat+padded (B*NP, ·) with g zero-padded beyond n_valid (padded
    rows then contribute exactly zero to every gradient — same argument as
    the split path). Returns (dx flat (B*NP, D) incl. the +g residual term,
    dwqkv, dbqkv, dwo, dbo, dgamma, dls, dlb) with weight grads in f32."""
    m, d3 = qkv.shape
    d = d3 // 3
    dh_ = d // num_heads
    scale = dh_ ** -0.5
    b = m // np_

    kernel = functools.partial(_mhsa_bwd_all_kernel, num_heads=num_heads,
                               scale=scale, n_valid=n_valid, ln_eps=ln_eps,
                               pg=_pack_group(num_heads, dh_))
    whole = lambda i: (0, 0)
    vec = lambda i: (0,)
    row_spec = lambda width: pl.BlockSpec((np_, width), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
    acc_spec = lambda r, cc: pl.BlockSpec((r, cc), whole,
                                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((d,), vec, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x.dtype),              # dx
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),      # dwqkv
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),      # dbqkv
            jax.ShapeDtypeStruct((d, d), jnp.float32),          # dwo
            jax.ShapeDtypeStruct((1, d), jnp.float32),          # dbo
            jax.ShapeDtypeStruct((1, d), jnp.float32),          # dgamma
            jax.ShapeDtypeStruct((1, d), jnp.float32),          # dls
            jax.ShapeDtypeStruct((1, d), jnp.float32),          # dlb
        ),
        grid=(b,),
        in_specs=[
            row_spec(d),            # x
            row_spec(3 * d),        # qkv
            row_spec(d),            # ctx
            row_spec(d),            # g
            acc_spec(d, 3 * d),     # wqkv
            acc_spec(d, d),         # wo
            vec_spec,               # bo
            vec_spec,               # gamma
            vec_spec,               # ln_scale
            vec_spec,               # ln_bias
        ],
        out_specs=(row_spec(d), acc_spec(d, 3 * d), acc_spec(1, 3 * d),
                   acc_spec(d, d), acc_spec(1, d), acc_spec(1, d),
                   acc_spec(1, d), acc_spec(1, d)),
        scratch_shapes=[pltpu.VMEM((np_, 3 * d), qkv.dtype)],
        # weight-grad accumulation across the grid -> sequential semantics
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_BWD_ALL_VMEM_MB * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(12 * b * num_heads * np_ * np_ * dh_
                   + 22 * b * np_ * d * d),
            bytes_accessed=(7 * m * d) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * np_ * np_),
    )(x, qkv, ctx, g, wqkv, wo, bo, gamma, ln_scale, ln_bias)
    return outs

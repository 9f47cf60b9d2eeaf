"""Swin Transformer backbone (flax.linen, NHWC, static shapes).

TPU-native reimplementation of the architecture behind HF `SwinModel` — the
reference's geopose backbone ("microsoft/swin-base-patch4-window12-384",
`swin_transformer/swin_attempt_2.py:32,117`; tiny-224 in
`swin_finetuning.py:53`) and one angle variant
(`angle_prediction/swin/swin_angle_finetuning.py:54`).

Parity notes (verified against transformers.models.swin.modeling_swin):
- patch embed Conv k4/s4 -> LayerNorm
- per block: LN -> window MSA (separate q/k/v Dense, relative-position-bias
  table indexed by the standard (2w-1)^2 scheme, additive -100 mask for
  shifted windows) -> +residual -> LN -> MLP(4x GELU) -> +residual
- shift = window//2 on odd blocks within a stage
- patch merging: concat [x00, x10, x01, x11] -> LN(4C) -> Linear(4C->2C,
  no bias)
- final LN; "pooler" = mean over tokens
All resolutions are compile-time constants (224/w7 and 384/w12 divide
evenly), so window partitioning is pure reshape/transpose and the
shifted-window mask is a numpy constant baked at trace time — no dynamic
shapes anywhere.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geovpr.models.backbone import BackboneOutput
from geovpr.models.dinov2 import PDense, PScaleBias, _layer_norm
from geovpr.models.layers import DropPath, Mlp
from geovpr.ops import window_attention
from geovpr.ops.quant import INT8_PV, INT8_QK_SCORES

_SWIN_LOG2E = 1.4426950408889634  # log2(e): kernel softmax is exp2-domain

SWIN_VARIANTS = {
    "tiny-224": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                     window_size=7, image_size=224),
    "base-224": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                     window_size=7, image_size=224),
    "base-384": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                     window_size=12, image_size=384),
}

LN_EPS = 1e-5


def _pallas_backend() -> bool:
    """Whether the fused Pallas paths should engage. True on TPU; the
    GEOVPR_FORCE_PALLAS=1 escape lets CPU tests drive the kernel paths
    under the interpret-mode pallas_call patch (tests/test_pallas_ops.py
    pattern) — never set it in production. A stray env var on a non-TPU
    backend would die in Mosaic lowering with an opaque error, so warn
    loudly up front (ADVICE r4)."""
    if jax.default_backend() == "tpu":
        return True
    if os.environ.get("GEOVPR_FORCE_PALLAS") == "1":
        import warnings
        warnings.warn(
            "GEOVPR_FORCE_PALLAS=1 on a non-TPU backend: pallas_call will "
            "fail to lower unless the test harness patches interpret mode "
            "(tests/test_pallas_ops.py pattern)", RuntimeWarning,
            stacklevel=2)
        return True
    return False


def relative_position_index(window: int) -> np.ndarray:
    """Standard Swin (2w-1)^2 relative-position index table, (N, N) int32."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)                    # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]       # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)   # (N, N, 2)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


def shifted_window_labels(h: int, w: int, window: int,
                          shift: int) -> np.ndarray:
    """Per-token region labels for SW-MSA windows, (num_windows, N) int32.
    Two tokens in a window may attend iff their labels match (HF semantics,
    modeling_swin get_attn_mask). Kept as the COMPACT constant — the
    (nW, N, N) additive mask is expanded in-graph from this: baking the
    dense masks as HLO constants costs ~5 MB per stage-0 block and blows
    the remote-compile request past its size limit on real Swin-B-384
    programs."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    return win.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, N)


def shifted_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask for SW-MSA, (num_windows, N, N) float32 with
    0 / -100 entries — the dense form of `shifted_window_labels` (tests /
    host-side use; the model expands labels on device instead)."""
    win = shifted_window_labels(h, w, window, shift)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """(B * nW, window*window, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _repartition_perm(h: int, w: int, window: int,
                      shift_amt: int) -> np.ndarray:
    """Static row permutation implementing partition∘roll(-shift)∘reverse
    directly in window-partitioned coordinates: out_flat[t] =
    in_flat[perm[t]] per image, where flat rows are (window, token) pairs
    in partition order. One gather replaces the reverse + roll + partition
    transpose chain, whose 12-element-granularity copies measured ~1.2 ms
    per shifted block at Swin-B-384 B=64 (docs/DESIGN.md)."""
    nw_x = w // window
    n = window * window
    t = np.arange(h * w)
    wprime, nprime = np.divmod(t, n)
    wy, wx = np.divmod(wprime, nw_x)
    ry, rx = np.divmod(nprime, window)
    y = (wy * window + ry + shift_amt) % h
    x = (wx * window + rx + shift_amt) % w
    sy, sry = np.divmod(y, window)
    sx, srx = np.divmod(x, window)
    return ((sy * nw_x + sx) * n + sry * window + srx).astype(np.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def repartition(xw: jax.Array, window: int, h: int, w: int,
                shift_amt: int) -> jax.Array:
    """Roll the underlying image by -shift_amt on both spatial axes WITHOUT
    leaving the (B*nW, N, C) partitioned layout — a single static gather
    per image (see _repartition_perm). The VJP is the inverse permutation
    as another gather (a permutation's adjoint is its inverse; letting
    autodiff differentiate jnp.take would emit a scatter instead). Two
    dead ends recorded here: a "grouped" gather over contiguous g-row runs
    as (L/g, g*C) super-rows measured SLOWER e2e (71.3 vs 57.7 ms — the
    reshape is a physical relayout on TPU tiled memory, not a bitcast),
    and replacing the stage-boundary partition/reverse transposes with
    this gather was also slower (58.9 vs 57.7) — the gather only wins
    where it replaces the 3-op reverse+roll+partition chain."""
    bw, n, c = xw.shape
    nw = (h // window) * (w // window)
    b = bw // nw
    # Default ON (round 5): execute the SAME permutation as the
    # roll_relayout Pallas kernel (two adjacent window-row reads -> one
    # assembled row write, sequential whole-row traffic) instead of the
    # XLA row gather. Measured on the Swin-B-384 B=32 train step (4
    # repartitions per shifted block): 139.62 -> 136.40 ms, +2.4% img/s,
    # bit-identical across repeats (benches/SWIN_TRAIN_LAYOUT_r05.log).
    # GEOVPR_REPARTITION_KERNEL=0 restores the gather (A/B escape).
    if (abs(shift_amt) == window // 2 and h == w
            and os.environ.get("GEOVPR_REPARTITION_KERNEL", "1") == "1"
            and _pallas_backend()):
        from geovpr.ops.pallas_swin_block import (roll_relayout,
                                                  roll_relayout_ok)
        nw_lin = w // window
        if roll_relayout_ok(n, c, bw, nw_lin, nw_lin):
            return roll_relayout(xw, 1 if shift_amt > 0 else -1,
                                 window, nw_lin, nw_lin)
    perm = jnp.asarray(_repartition_perm(h, w, window, shift_amt))
    y = jnp.take(xw.reshape(b, h * w, c), perm, axis=1,
                 unique_indices=True)
    return y.reshape(bw, n, c)


def _repartition_fwd(xw, window, h, w, shift_amt):
    return repartition(xw, window, h, w, shift_amt), None


def _repartition_bwd(window, h, w, shift_amt, _, g):
    return (repartition(g, window, h, w, -shift_amt),)


repartition.defvjp(_repartition_fwd, _repartition_bwd)


@functools.lru_cache(maxsize=None)
def _merge_perm(res: int, win: int, next_win: int) -> np.ndarray:
    """Static permutation for the window-resident PatchMerging boundary:
    out_flat[t' * 4 + j] = in_flat[perm[t' * 4 + j]], where t' enumerates
    NEXT-stage tokens in (window, token) partition order, j enumerates the
    2x2 source quadrant in HF concat order [x00, x10, x01, x11]
    (modeling_swin SwinPatchMerging), and in_flat rows are THIS stage's
    partition order. One gather replaces the window_reverse transpose +
    the four strided-slice concats + the next stage's window_partition
    transpose. Returns (perm, inv_perm): the map is a bijection of the
    res*res tokens (every source token feeds exactly one (t', j) slot), so
    the VJP is the inverse permutation as another gather."""
    next_res = res // 2
    nw_x, nw_x2 = res // win, next_res // next_win
    n, n2 = win * win, next_win * next_win
    t = np.arange(next_res * next_res)
    wprime, nprime = np.divmod(t, n2)
    wy, wx = np.divmod(wprime, nw_x2)
    ry, rx = np.divmod(nprime, next_win)
    y2, x2 = wy * next_win + ry, wx * next_win + rx        # next-stage raster
    perm = np.empty((t.size, 4), np.int32)
    for j, (dy, dx) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        ys, xs = 2 * y2 + dy, 2 * x2 + dx                  # source raster
        sy, sry = np.divmod(ys, win)
        sx, srx = np.divmod(xs, win)
        perm[:, j] = (sy * nw_x + sx) * n + sry * win + srx
    perm = perm.reshape(-1)
    return perm, np.argsort(perm).astype(np.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def merge_gather(xw: jax.Array, res: int, win: int,
                 next_win: int) -> jax.Array:
    """Stage-boundary relayout for PatchMerging WITHOUT leaving window
    partitioning: (B*nW, N, C) in this stage's layout -> (B*nW', N', 4C)
    already in the NEXT stage's layout, with the 4C axis in HF
    SwinPatchMerging concat order. One static row gather per image (see
    _merge_perm); the (N', 4, C) -> (N', 4C) reshape is contiguous (free).
    Replaces the measured reverse+concat+partition chain at each of the 3
    stage boundaries (docs/DESIGN.md, Swin eval budget)."""
    bw, n, c = xw.shape
    nw = (res // win) ** 2
    b = bw // nw
    next_res = res // 2
    n2 = next_win * next_win
    perm, _ = _merge_perm(res, win, next_win)
    y = jnp.take(xw.reshape(b, res * res, c), jnp.asarray(perm), axis=1,
                 unique_indices=True, indices_are_sorted=False)
    return y.reshape(b * (next_res // next_win) ** 2, n2, 4 * c)


def _merge_gather_fwd(xw, res, win, next_win):
    return merge_gather(xw, res, win, next_win), None


def _merge_gather_bwd(res, win, next_win, _, g):
    # g: (B*nW', N', 4C); as (b, L'*4, c) its element order is exactly the
    # forward gather's output slots, so dx = g[inv_perm] per image
    b4, n2, c4 = g.shape
    c = c4 // 4
    next_res = res // 2
    b = b4 // ((next_res // next_win) ** 2)
    _, inv = _merge_perm(res, win, next_win)
    gx = jnp.take(g.reshape(b, res * res, c), jnp.asarray(inv), axis=1,
                  unique_indices=True, indices_are_sorted=False)
    nw = (res // win) ** 2
    return (gx.reshape(b * nw, win * win, c),)


merge_gather.defvjp(_merge_gather_fwd, _merge_gather_bwd)


class SwinAttnParams(nn.Module):
    """Window-attention parameter holder with the same tree paths as the
    former nn.Dense-based WindowAttention module (query/key/value/proj
    each {kernel, bias}, plus the relative-position-bias table) — lets
    SwinBlock feed ONE weight set to either the unfused XLA/window-kernel
    path or the fused Pallas half-block kernel."""

    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self):
        p = {name: PDense(self.dim, self.dim, name=name)()
             for name in ("query", "key", "value", "proj")}
        p["table"] = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.num_heads))
        return p


def _window_attn_apply(xw, attn, bias, mask, num_heads: int,
                       use_pallas: bool, dtype, sow_ctx=None,
                       sow_qk=None) -> jax.Array:
    """Unfused window attention from the shared params: q/k/v/out
    projections as plain dots around the `window_attention` op (which
    itself picks the Pallas window kernel or XLA einsum). `sow_ctx` /
    `sow_qk` are the calibration hooks: called with the pre-proj attention
    context and the post-projection q/k so the int8 path can derive its
    static a_ctx / a_q / a_k scales."""
    bw, n, c = xw.shape
    dh = c // num_heads

    def proj(t, kb):
        kernel, b_ = kb
        return (jnp.dot(t.astype(dtype), kernel.astype(dtype),
                        preferred_element_type=jnp.float32)
                + b_.astype(jnp.float32)).astype(dtype)

    def heads(t):
        return t.reshape(bw, n, num_heads, dh).transpose(0, 2, 1, 3)

    q = heads(proj(xw, attn["query"]))
    k = heads(proj(xw, attn["key"]))
    v = heads(proj(xw, attn["value"]))
    if sow_qk is not None:
        sow_qk(q, k, v)
    out = window_attention(q, k, v, bias, mask, use_pallas=use_pallas)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    if sow_ctx is not None:
        sow_ctx(out)
    return proj(out, attn["proj"])


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: int   # feature-map side length at this stage
    window: int
    shift: int
    drop_path: float = 0.0
    use_pallas: bool = True
    # w8a8 serving path / its calibration pass (geovpr/models/quantize.py)
    int8_mlp: bool = False
    int8_attn: bool = False
    calibrate: bool = False
    # resident window-partitioned layout: x arrives and leaves as
    # (B*nW, N, C) windows instead of (B, L, C) spatial tokens. Measured
    # motivation (docs/DESIGN.md): at B=64 the per-block partition/reverse
    # + roll permutation copies around the fused kernels cost 15.9 ms of
    # the 64.7 ms Swin-B-384 int8 eval step (25%). With the stream kept
    # partitioned across a stage, unshifted blocks pay ZERO layout copies
    # (LN/MLP/projections are row-local; the kernel consumes windows
    # directly) and shifted blocks pay one static row permutation each way
    # (reverse -> roll -> partition, which XLA fuses into one copy).
    partitioned_io: bool = False
    # alternating-layout serving (GEOVPR_SWIN_ALT_LAYOUT): the partitioned
    # stream arrives rolled by `in_shift` (the PREVIOUS block's shift) and
    # leaves rolled by `self.shift`; the fused kernel assembles each
    # window-row in VMEM from two adjacent source rows
    # (pallas_swin_block._roll_assemble) instead of this block paying the
    # two HBM `repartition` gathers. Driver-gated: SwinTransformer enables
    # it per stage only when swin_rolled_ok holds and the serving kernels
    # will actually run.
    alt_layout: bool = False
    in_shift: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # x: (B, L, C) with L = resolution^2, or (B*nW, N, C) when
        # partitioned_io (see above)
        b, l, c = x.shape
        h = w = self.resolution
        n = self.window * self.window
        nw = (h // self.window) * (w // self.window)
        if self.partitioned_io:
            b = b // nw
            l = h * w
        alt = self.alt_layout and self.partitioned_io
        roll = None
        if alt and self.shift != self.in_shift:
            roll = (1 if self.shift > self.in_shift else -1,
                    self.window, w // self.window, h // self.window)
        shortcut = x
        # Serving kernel on the deterministic (eval) path only: its
        # backward is an XLA recompute — the train path has its own fused
        # kernel with a structured backward (train_kernel_ok below).
        # Calibration forces the unfused path: it sows the pre-proj
        # attention context amax, which the fused kernels never
        # materialize.
        pallas_ok = (self.use_pallas and deterministic
                     and _pallas_backend()
                     and not self.calibrate)

        n1_scale, n1_bias = PScaleBias(c, name="norm1")()
        attn = SwinAttnParams(self.dim, self.num_heads, self.window,
                              name="attn")()
        idx = relative_position_index(self.window)  # static numpy
        bias = attn["table"][idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (H, N, N)
        if self.shift > 0:
            # expand the (nW, N, N) additive mask on device from the tiny
            # (nW, N) label constant (see shifted_window_labels)
            labels = jnp.asarray(
                shifted_window_labels(h, w, self.window, self.shift))
            mask = jnp.where(labels[:, None, :] != labels[:, :, None],
                             -100.0, 0.0).astype(jnp.float32)
        else:
            mask = None

        def to_windows(t):
            """Layout in: block input -> (BW, N, C) rolled windows."""
            if alt:
                # alternating layout: the kernel assembles the roll in
                # VMEM (see `roll` above); the stream passes through
                return t
            if self.partitioned_io:
                if self.shift == 0:
                    return t
                return repartition(t, self.window, h, w, self.shift)
            ts = t.reshape(b, h, w, c)
            if self.shift > 0:
                ts = jnp.roll(ts, shift=(-self.shift, -self.shift),
                              axis=(1, 2))
            return window_partition(ts, self.window)

        def from_windows(t):
            """Layout out: (BW, N, C) rolled windows -> block layout."""
            if alt:
                # output stays in THIS block's shift layout; the next
                # consumer assembles from it
                return t
            if self.partitioned_io:
                if self.shift == 0:
                    return t
                return repartition(t, self.window, h, w, -self.shift)
            ts = window_reverse(t, self.window, h, w)
            if self.shift > 0:
                ts = jnp.roll(ts, shift=(self.shift, self.shift),
                              axis=(1, 2))
            return ts.reshape(b, l, c)

        def residual_drop(t):
            """shortcut + DropPath(t), drawing the stochastic-depth mask
            per IMAGE even in partitioned layout (whose leading axis is
            B*nW, not B — a per-window mask would change the reference's
            per-sample DropPath semantics). The (B*nW, N, C) <->
            (B, nW*N, C) reshapes are free (contiguous)."""
            dp = DropPath(self.drop_path)
            if self.partitioned_io:
                tb = dp(t.reshape(b, nw * n, c), deterministic)
                return shortcut + tb.reshape(b * nw, n, c)
            return shortcut + dp(t, deterministic)

        if self.int8_attn:
            d = self.dim
            qa = {
                name: self.variable("quant", name, init, shape, dt)
                for name, init, shape, dt in (
                    ("attn_a_x", jnp.ones, (), jnp.float32),
                    ("attn_a_ctx", jnp.ones, (), jnp.float32),
                    ("attn_a_q", jnp.ones, (), jnp.float32),
                    ("attn_a_k", jnp.ones, (), jnp.float32),
                    ("attn_a_v", jnp.ones, (), jnp.float32),
                    ("attn_wqkv_q", jnp.zeros, (d, 3 * d), jnp.int8),
                    ("attn_wqkv_scale", jnp.ones, (3 * d,), jnp.float32),
                    ("attn_wo_q", jnp.zeros, (d, d), jnp.int8),
                    ("attn_wo_scale", jnp.ones, (d,), jnp.float32),
                )
            }
            if not self.is_initializing():
                attn_args = self._attn_int8_fold(n1_scale, n1_bias, attn, qa)
                xw = to_windows(x)
                ow = self._attention_int8(xw, attn_args, bias, mask,
                                          roll=roll)
                x = from_windows(ow)
                return self._mlp_half(x, deterministic)

        from geovpr.ops.pallas_swin_block import (
            fused_swin_attn_block, fused_swin_attn_train,
            swin_block_kernel_ok)
        # training fast path: same fused forward shape, but saves qkv/ctx
        # residuals for the STRUCTURED Pallas backward (probabilities
        # recomputed in VMEM; dqkv + rel-pos-bias grad in one kernel) and
        # leaves the residual outside so DropPath keeps its semantics
        train_kernel_ok = (self.use_pallas and not deterministic
                           and _pallas_backend()
                           and not self.calibrate)
        kernel_shapes_ok = (not self.is_initializing()
                            and swin_block_kernel_ok(n, c, b * nw,
                                                     self.num_heads))
        if roll is not None and not ((pallas_ok or train_kernel_ok)
                                     and kernel_shapes_ok):
            # the rolled stream is only consumable by the fused serving /
            # training kernels; the driver gates alt-layout on exactly this
            raise RuntimeError(
                "alt-layout Swin stream reached a non-kernel path")
        if pallas_ok and kernel_shapes_ok:
            # fused half-block: LN1 -> qkv -> window attention -> proj ->
            # +residual in ONE kernel (one read + one write of the token
            # stream instead of ~25 elementwise/projection HBM passes at
            # stage-0 shapes — see pallas_swin_block docstring). Residual
            # lives inside the kernel; roll/partition commute with the
            # per-token LN and the residual add, so fusing in rolled
            # window space is exact.
            xw = to_windows(x)
            wqkv = jnp.concatenate(
                [attn["query"][0], attn["key"][0], attn["value"][0]],
                axis=1).astype(self.dtype)
            bqkv = jnp.concatenate(
                [attn["query"][1], attn["key"][1], attn["value"][1]])
            if roll is not None:
                from geovpr.ops.pallas_swin_block import (
                    fused_swin_attn_block_rolled)
                ow = fused_swin_attn_block_rolled(
                    xw.astype(self.dtype), n1_scale, n1_bias, wqkv, bqkv,
                    attn["proj"][0].astype(self.dtype), attn["proj"][1],
                    bias, mask, self.num_heads, roll[0], roll[1], roll[2],
                    roll[3], LN_EPS)
                if ow is None:     # driver pre-checks swin_rolled_ok
                    raise RuntimeError(
                        "alt-layout enabled for an ineligible Swin block")
            else:
                ow = fused_swin_attn_block(
                    xw.astype(self.dtype), n1_scale, n1_bias, wqkv, bqkv,
                    attn["proj"][0].astype(self.dtype), attn["proj"][1],
                    bias, mask, self.num_heads, LN_EPS)
            x = from_windows(ow)
        elif train_kernel_ok and kernel_shapes_ok:
            xw = to_windows(x)
            wqkv = jnp.concatenate(
                [attn["query"][0], attn["key"][0], attn["value"][0]],
                axis=1).astype(self.dtype)
            bqkv = jnp.concatenate(
                [attn["query"][1], attn["key"][1], attn["value"][1]])
            if roll is not None:
                # alternating-layout TRAINING (GEOVPR_SWIN_ALT_TRAIN):
                # the kernel assembles this block's layout in VMEM and
                # returns the assembled stream as the residual shortcut —
                # no repartition gathers forward, one roll_relayout in the
                # VJP (driver pre-checks swin_train_rolled_ok)
                from geovpr.ops.pallas_swin_block import (
                    fused_swin_attn_train_rolled)
                y, xr = fused_swin_attn_train_rolled(
                    xw.astype(self.dtype), n1_scale, n1_bias, wqkv, bqkv,
                    attn["proj"][0].astype(self.dtype), attn["proj"][1],
                    bias, mask, self.num_heads, LN_EPS, roll[0], roll[1],
                    roll[2], roll[3])
                # residual in THIS block's layout; DropPath mask stays
                # per-IMAGE via the free (B*nW, N, C) <-> (B, nW*N, C)
                # reshapes (residual_drop's invariant)
                dp = DropPath(self.drop_path)
                yb = dp(y.reshape(b, nw * n, c), deterministic)
                x = xr + yb.reshape(b * nw, n, c)
            else:
                y = fused_swin_attn_train(
                    xw.astype(self.dtype), n1_scale, n1_bias, wqkv, bqkv,
                    attn["proj"][0].astype(self.dtype), attn["proj"][1],
                    bias, mask, self.num_heads, LN_EPS)
                x = residual_drop(from_windows(y))
        else:
            x = _layer_norm(x, n1_scale, n1_bias, eps=LN_EPS)
            if self.calibrate:
                self.sow("quant_calib", "attn_x",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            xw = to_windows(x)
            sow_ctx = sow_qk = None
            if self.calibrate:
                sow_ctx = lambda t: self.sow(
                    "quant_calib", "attn_ctx",
                    jnp.max(jnp.abs(t.astype(jnp.float32))))

                def sow_qk(q, k, v):
                    # int8-score / int8-PV calibration: post-projection
                    # q/k/v amax (pre head-scale — it rides the dequant
                    # constant)
                    self.sow("quant_calib", "attn_q",
                             jnp.max(jnp.abs(q.astype(jnp.float32))))
                    self.sow("quant_calib", "attn_k",
                             jnp.max(jnp.abs(k.astype(jnp.float32))))
                    self.sow("quant_calib", "attn_v",
                             jnp.max(jnp.abs(v.astype(jnp.float32))))
            xw = _window_attn_apply(xw, attn, bias, mask, self.num_heads,
                                    use_pallas=pallas_ok, dtype=self.dtype,
                                    sow_ctx=sow_ctx, sow_qk=sow_qk)
            x = residual_drop(from_windows(xw))

        return self._mlp_half(x, deterministic)

    def _attn_int8_fold(self, n1_scale, n1_bias, attn, qa):
        """Pre-fold the static int8 scales of the attention half (scheme:
        geovpr/ops/quant.py; fold: pallas_swin_block._kernel_int8) into
        the argument tuple shared by the Pallas kernel and the XLA
        fallback. Swin has no LayerScale, so no gamma in the tuple."""
        d = self.dim
        a_x = qa["attn_a_x"].value
        a_ctx = qa["attn_a_ctx"].value
        bqkv = jnp.concatenate(
            [attn["query"][1], attn["key"][1], attn["value"][1]]
        ).astype(jnp.float32)
        # fold 1/a_ctx into the v third of the dequant scale and bias: the
        # attention context (a convex combination of v rows) then lands
        # directly in quantized units (and 1/a_q, 1/a_k into the q/k
        # thirds under INT8_QK_SCORES; the head scale then rides the
        # score-dequant constant cs — natural-log domain here, kernel
        # callers multiply by log2(e))
        col3 = jnp.arange(3 * d)
        cs = cpv = None
        if INT8_QK_SCORES:
            a_q = qa["attn_a_q"].value
            a_k = qa["attn_a_k"].value
            if INT8_PV:
                a_v = qa["attn_a_v"].value
                v_fold = 1.0 / a_v
                cpv = a_v / (127.0 * a_ctx)
            else:
                v_fold = 1.0 / a_ctx
            thirds = jnp.where(col3 < d, 1.0 / a_q,
                               jnp.where(col3 < 2 * d, 1.0 / a_k, v_fold))
            cs = a_q * a_k * (d // self.num_heads) ** -0.5
        else:
            thirds = jnp.where(col3 < 2 * d, 1.0, 1.0 / a_ctx)
        return (n1_scale.astype(jnp.float32) / a_x,
                n1_bias.astype(jnp.float32) / a_x,
                qa["attn_wqkv_q"].value,
                a_x * qa["attn_wqkv_scale"].value * thirds,
                bqkv * thirds,
                qa["attn_wo_q"].value,
                a_ctx * qa["attn_wo_scale"].value,
                attn["proj"][1].astype(jnp.float32),
                cs, cpv)

    def _attention_int8(self, xw, attn_args, bias, mask, roll=None):
        """w8a8 attention half on pre-partitioned (BW, N, C) windows: the
        fused int8 Pallas kernel on TPU, or an XLA fallback with identical
        arithmetic (CPU tests, window-7 shapes). Layout (roll/partition or
        the resident-partitioned repartition) is the caller's job — except
        `roll=(sign, window, nw_x, nw_y)` (alternating layout), where the
        kernel itself assembles the rolled stream in VMEM; only the fused
        kernel understands that, so the fallback raises.
        Serving-only — stop_gradient'ed."""
        c = xw.shape[-1]
        (ln_scale_q, ln_bias_q, wqkv_q, sqkv_eff, bqkv_eff, wo_q, so_eff,
         bo, cs, cpv) = attn_args

        ow = None
        if self.use_pallas and _pallas_backend():
            from geovpr.ops.pallas_swin_block import fused_swin_attn_block_int8
            rkw = ({} if roll is None else
                   dict(roll_sign=roll[0], window=roll[1], nw_x=roll[2],
                        nw_y=roll[3]))
            ow = fused_swin_attn_block_int8(
                xw.astype(jnp.bfloat16), ln_scale_q, ln_bias_q, wqkv_q,
                sqkv_eff, bqkv_eff, wo_q, so_eff, bo, bias, mask,
                self.num_heads, LN_EPS,
                cs=None if cs is None else cs * _SWIN_LOG2E, cpv=cpv,
                **rkw)
            if ow is not None:
                ow = ow.astype(xw.dtype)
        if ow is None and roll is not None:
            raise RuntimeError(
                "alt-layout Swin stream reached a non-kernel int8 path")
        if ow is None:
            # XLA fallback: same arithmetic, plain exp-domain softmax
            bw, n, _ = xw.shape
            dh = c // self.num_heads
            xf = xw.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
            normed = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
            xq = jnp.clip(jnp.round(normed * ln_scale_q + ln_bias_q),
                          -127, 127).astype(jnp.int8)
            yi = jax.lax.dot_general(
                xq.reshape(-1, c), wqkv_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            qkv_f = (yi.astype(jnp.float32)
                     * sqkv_eff + bqkv_eff).reshape(bw, n, 3 * c)

            def heads(t):
                return t.reshape(bw, n, self.num_heads, dh
                                 ).transpose(0, 2, 1, 3)

            if cs is not None:
                # int8 score matmuls, same arithmetic as the kernel's
                # qk8 path
                from geovpr.ops.window_attention import (
                    _window_attention_from_scores)
                q8 = jnp.clip(jnp.round(qkv_f[..., :c]), -127,
                              127).astype(jnp.int8)
                k8 = jnp.clip(jnp.round(qkv_f[..., c:2 * c]), -127,
                              127).astype(jnp.int8)
                s = jnp.einsum("bhnd,bhmd->bhnm", heads(q8), heads(k8),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * cs
                if cpv is not None:
                    # int8 PV: bias/mask add, max-shift, quantize the
                    # shifted probabilities to 127ths, int8 context
                    # (kernel arithmetic)
                    s = s + bias[None]
                    if mask is not None:
                        nwm = mask.shape[0]
                        s = (s.reshape(bw // nwm, nwm, *s.shape[1:])
                             + mask[None, :, None]).reshape(bw, *s.shape[1:])
                    v8 = jnp.clip(jnp.round(qkv_f[..., 2 * c:]), -127,
                                  127).astype(jnp.int8)
                    sm = s - jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(sm)
                    z = jnp.sum(p, axis=-1, keepdims=True)
                    pi = jnp.round(p * 127.0).astype(jnp.int8)
                    ctx = (jnp.einsum("bhnm,bhmd->bhnd", pi, heads(v8),
                                      preferred_element_type=jnp.int32
                                      ).astype(jnp.float32) * cpv / z)
                else:
                    v = qkv_f[..., 2 * c:].astype(jnp.bfloat16)
                    ctx = _window_attention_from_scores(s, heads(v), bias,
                                                        mask)
            else:
                qkv = qkv_f.astype(jnp.bfloat16)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                ctx = window_attention(heads(q), heads(k), heads(v), bias,
                                       mask, use_pallas=False)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(bw * n, c)
            ctxq = jnp.clip(jnp.round(ctx.astype(jnp.float32)),
                            -127, 127).astype(jnp.int8)
            yo = jax.lax.dot_general(
                ctxq, wo_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = yo.astype(jnp.float32) * so_eff + bo
            ow = jax.lax.stop_gradient(
                (out.reshape(bw, n, c) + xf).astype(xw.dtype))
        return ow

    def _mlp_half(self, x, deterministic):
        # norm2 as explicit scale/bias params (names match nn.LayerNorm, so
        # checkpoints/converters are unchanged): the int8 serving path
        # fuses LN -> int8 MLP -> +residual into one op (the Pallas MLP
        # block kernel on TPU — keeps the (M, 4C) f32 hidden in VMEM; the
        # identical XLA arithmetic elsewhere). Swin has no LayerScale, so
        # gamma = ones.
        c = self.dim
        n2_scale, n2_bias = PScaleBias(c, name="norm2")()
        mlp = Mlp(hidden_dim=4 * self.dim, name="mlp", dtype=self.dtype,
                  int8=self.int8_mlp, calibrate=self.calibrate)
        if (self.int8_mlp and deterministic
                and not self.is_initializing()):
            return mlp(x, deterministic=True,
                       fused=(n2_scale, n2_bias,
                              jnp.ones((c,), jnp.float32), LN_EPS))
        y = _layer_norm(x, n2_scale, n2_bias, eps=LN_EPS)
        y = mlp(y, deterministic=deterministic)
        dp = DropPath(self.drop_path)
        if self.partitioned_io:
            # per-IMAGE stochastic-depth mask (see residual_drop)
            b = x.shape[0] * x.shape[1] // (self.resolution ** 2)
            yb = dp(y.reshape(b, -1, self.dim), deterministic)
            return x + yb.reshape(x.shape)
        return x + dp(y, deterministic)


class _PKernel(nn.Module):
    """Bias-less nn.Dense-compatible parameter holder (kernel only)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.out_dim))


class PatchMerging(nn.Module):
    """Swin downsample: 2x2 concat -> LN(4C) -> Linear(4C->2C, no bias).

    `partitioned=True` (with `window`/`out_window`) consumes THIS stage's
    window-resident (B*nW, N, C) stream and emits the NEXT stage's
    (B*nW', N', 2C) directly — the reverse/concat/partition layout chain
    collapses into merge_gather's single static row permutation. Parameter
    names/shapes are identical either way (same "norm"/"reduction" tree
    paths; LN and Dense act on the last axis only)."""

    dim: int
    resolution: int
    dtype: jnp.dtype = jnp.float32
    partitioned: bool = False
    window: int = 0        # this stage's window (partitioned only)
    out_window: int = 0    # next stage's window (partitioned only)
    # alternating-layout serving boundary: consume the window-resident
    # stream in the LAST block's `in_shift` layout and emit the next
    # stage's (unshifted) window layout via the fused Pallas boundary
    # kernel (ops/pallas_patch_merge.py) — the reverse/roll/concat/
    # partition relayouts never touch HBM. Driver-gated on
    # patch_merge_rolled_ok + the serving kernels being live.
    alt_rolled: bool = False
    in_shift: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.alt_rolled:
            c = x.shape[-1]
            ln_s, ln_b = PScaleBias(4 * c, name="norm")()
            wk = self.param_holder_reduction(4 * c)
            from geovpr.ops.pallas_patch_merge import fused_patch_merge_rolled
            out = fused_patch_merge_rolled(
                x.astype(self.dtype), ln_s, ln_b, wk.astype(self.dtype),
                resolution=self.resolution, window=self.window,
                next_window=self.out_window, shift=self.in_shift,
                ln_eps=LN_EPS)
            if out is None:
                raise RuntimeError(
                    "alt-rolled PatchMerging on an ineligible boundary")
            return out
        if self.partitioned:
            x = merge_gather(x, self.resolution, self.window,
                             self.out_window)
        else:
            b, l, c = x.shape
            h = w = self.resolution
            x = x.reshape(b, h, w, c)
            # HF concat order: [x00, x10, x01, x11]
            # (modeling_swin SwinPatchMerging)
            x = jnp.concatenate([
                x[:, 0::2, 0::2, :], x[:, 1::2, 0::2, :],
                x[:, 0::2, 1::2, :], x[:, 1::2, 1::2, :],
            ], axis=-1)
            x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm", dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction",
                        dtype=self.dtype)(x)

    def param_holder_reduction(self, in_dim: int) -> jax.Array:
        """The reduction kernel with nn.Dense-compatible tree path
        ("reduction"/"kernel", no bias — matching use_bias=False), for the
        fused boundary kernel."""
        return _PKernel(in_dim, 2 * self.dim, name="reduction")()


class SwinTransformer(nn.Module):
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 12
    image_size: int = 384
    patch_size: int = 4
    drop_path_rate: float = 0.1
    # eval path takes the fused Swin attention half-block kernel; the
    # train path takes its training variant (stored-probability
    # structured backward) — see SwinBlock.pallas_ok / train_kernel_ok
    use_pallas: bool = True
    # rematerialize blocks on backward — Swin-B-384's stage-1 activations
    # (9216 tokens) dominate memory; remat trades FLOPs for per-chip batch
    remat: bool = False
    # w8a8 serving path (inference only) / its calibration pass
    int8_mlp: bool = False
    int8_attn: bool = False
    calibrate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> BackboneOutput:
        del train  # no batch-norm; kept for interface uniformity
        x = x.astype(self.dtype)
        b = x.shape[0]
        res = self.image_size // self.patch_size
        if res % self.window_size != 0:
            raise ValueError(
                f"patch grid {res} not divisible by window {self.window_size}")

        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed", dtype=self.dtype)(x)
        x = x.reshape(b, res * res, self.embed_dim)
        x = nn.LayerNorm(epsilon=LN_EPS, name="embed_norm", dtype=self.dtype)(x)

        total_blocks = sum(self.depths)
        dprates = np.linspace(0, self.drop_path_rate, total_blocks)
        block_i = 0
        dim = self.embed_dim
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if self.remat else SwinBlock)
        # Resident window-partitioned layout across each stage on the TPU
        # path (serving AND training): partition once per stage, run the
        # blocks window-partitioned (unshifted blocks then pay zero layout
        # copies; shifted blocks one static-gather repartition each way,
        # with the inverse-permutation gather as its VJP), reverse once
        # for PatchMerging. Measured at B=64 int8 eval: the per-block
        # partition/reverse+roll copies cost 15.9 ms of the 64.7 ms step
        # (docs/DESIGN.md). DropPath masks are drawn per image via a free
        # reshape (SwinBlock.residual_drop).
        override = os.environ.get("GEOVPR_SWIN_PARTITIONED")
        if override is not None:
            # trace-time escape hatch: A/B layout benchmarking in one
            # process, and CPU coverage of the partitioned plumbing
            partitioned = override == "1"
        else:
            partitioned = (self.use_pallas
                           and _pallas_backend())
        partitioned = (partitioned and not self.calibrate
                       and not self.is_initializing())
        # Alternating-layout serving (round 4): instead of the two
        # repartition HBM gathers around every shifted block, let the
        # stream STAY in each block's own shift layout and have the fused
        # serving kernels assemble their window-rows in VMEM from the
        # ±(window//2)-rolled predecessor layout
        # (pallas_swin_block._roll_assemble). Per stage: the first block
        # pays nothing, every later block one in-kernel assembly; the
        # stage-boundary unroll is a cheap 2-concat jnp.roll in raster
        # space. Serving only (deterministic; the train kernels keep the
        # repartition path), gated per stage on swin_rolled_ok.
        alt_env = os.environ.get("GEOVPR_SWIN_ALT_LAYOUT", "1") == "1"
        # round 5: the TRAINING step can take the alternating layout too
        # (fused_swin_attn_train_rolled — in-kernel assembly + structured
        # backward + one roll_relayout in the VJP, replacing the four
        # repartition gathers per shifted block). Measurement-gated knob,
        # same discipline as every layout default here.
        alt_train = (not deterministic
                     and os.environ.get("GEOVPR_SWIN_ALT_TRAIN",
                                        "0") == "1")
        alt_env = (alt_env and (deterministic or alt_train)
                   and os.environ.get("GEOVPR_SWIN_MERGE_FOLD", "0") != "1")
        from geovpr.ops.pallas_swin_block import (swin_rolled_ok,
                                                  swin_train_rolled_ok)
        rolled_ok_fn = (swin_rolled_ok if deterministic
                        else swin_train_rolled_ok)
        in_windows = False       # whether x is currently (B*nW, N, C)
        for stage_i, depth in enumerate(self.depths):
            win = min(self.window_size, res)
            use_part = partitioned and res % win == 0
            if use_part and not in_windows:
                # transpose-based partition measured faster than the
                # row-gather equivalent at stage boundaries (57.7 vs
                # 58.9 ms e2e) — the narrow-row gather only wins where it
                # replaces a longer layout chain (repartition/merge_gather)
                x = window_partition(x.reshape(b, res, res, dim), win)
            in_windows = use_part
            nw_lin = res // win
            # alt-layout additionally requires the serving kernels to
            # actually engage (the rolled stream is kernel-only — the
            # GEOVPR_SWIN_PARTITIONED=1 CPU override must not enable it)
            use_alt = (use_part and alt_env and nw_lin > 1
                       and self.use_pallas and _pallas_backend()
                       and rolled_ok_fn(win * win, dim, b * nw_lin ** 2,
                                        self.num_heads[stage_i],
                                        nw_lin, nw_lin))
            cur_shift = 0
            for layer_i in range(depth):
                shift = 0 if layer_i % 2 == 0 else self.window_size // 2
                if res <= self.window_size:
                    shift = 0
                x = block_cls(
                    dim=dim, num_heads=self.num_heads[stage_i], resolution=res,
                    window=win, shift=shift,
                    drop_path=float(dprates[block_i]),
                    use_pallas=self.use_pallas,
                    int8_mlp=self.int8_mlp, int8_attn=self.int8_attn,
                    calibrate=self.calibrate, partitioned_io=use_part,
                    alt_layout=use_alt,
                    in_shift=cur_shift if use_alt else 0,
                    name=f"stage{stage_i}_block{layer_i}",
                    dtype=self.dtype)(x, deterministic)
                if use_alt:
                    cur_shift = shift
                block_i += 1
            last_stage = stage_i == len(self.depths) - 1
            # the stage boundary: when both sides run window-resident, the
            # reverse + 2x2-concat + next-partition layout chain CAN fold
            # into PatchMerging's single merge_gather permutation
            # (GEOVPR_SWIN_MERGE_FOLD=1). Measured-futile and DEFAULT OFF:
            # Swin-B-384 int8 eval 55.89 -> 59.49 ms at B=64 (same-session
            # A/B, round 4) — the full-L row gather runs ~3.4x off copy
            # bandwidth at these row widths, losing to the transpose chain
            # + XLA's fusion of the strided concat into the LN/matmul, the
            # same way the earlier gather-based boundary conversion lost
            # (58.9 vs 57.7 ms, docs/DESIGN.md). fold implies the next
            # stage's use_part (same divisibility condition), so the
            # partitioned output carries straight into its blocks.
            next_win = 0 if last_stage else min(self.window_size, res // 2)
            fold = bool(use_part and next_win
                        and (res // 2) % next_win == 0
                        and os.environ.get("GEOVPR_SWIN_MERGE_FOLD",
                                           "0") == "1")
            # alt-layout boundary: the fused Pallas PatchMerging kernel
            # consumes the shifted window stream and emits the NEXT
            # stage's window layout directly (ops/pallas_patch_merge.py)
            from geovpr.ops.pallas_patch_merge import patch_merge_rolled_ok
            alt_merge = bool(
                use_alt and deterministic and cur_shift and next_win
                and (res // 2) % next_win == 0
                and os.environ.get("GEOVPR_SWIN_ALT_MERGE", "1") == "1"
                and patch_merge_rolled_ok(res, dim, win, next_win,
                                          cur_shift, b * nw_lin ** 2))
            if in_windows and not fold and not alt_merge:
                x = window_reverse(x, win, res, res)
                if cur_shift:
                    # alt-layout stream leaves the stage in the LAST
                    # block's shift layout; in raster space the unroll is
                    # two concats of contiguous slabs (near copy
                    # bandwidth), unlike the window-space gather
                    x = jnp.roll(x, shift=(cur_shift, cur_shift),
                                 axis=(1, 2))
                x = x.reshape(b, res * res, dim)
                in_windows = False
            if not last_stage:
                x = PatchMerging(dim=dim, resolution=res,
                                 partitioned=fold, window=win,
                                 out_window=next_win,
                                 alt_rolled=alt_merge, in_shift=cur_shift,
                                 name=f"stage{stage_i}_downsample",
                                 dtype=self.dtype)(x)
                dim *= 2
                res //= 2

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm", dtype=self.dtype)(x)
        tokens = x.astype(jnp.float32)
        pooled = jnp.mean(tokens, axis=1)  # == HF AdaptiveAvgPool1d pooler
        return BackboneOutput(pooled=pooled, tokens=tokens)

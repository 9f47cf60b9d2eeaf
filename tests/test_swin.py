"""Swin transformer numerical parity vs HF `SwinModel` (CPU, random init).

Uses a scaled-down config (2 stages, 64px, window 4) so CPU parity runs are
fast, plus shape/jit tests on the real tiny-224 variant. The scaled config
still exercises every architectural element: shifted+unshifted windows,
relative position bias, patch merging, final LN + mean pooler.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geovpr.models.swin import (
    SWIN_VARIANTS,
    SwinTransformer,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)
from geovpr.models.convert_torch import convert_swin_hf

SMALL = dict(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=4,
             image_size=64, drop_path_rate=0.0)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import SwinConfig, SwinModel
    torch.manual_seed(0)
    cfg = SwinConfig(
        image_size=SMALL["image_size"], patch_size=4, embed_dim=SMALL["embed_dim"],
        depths=list(SMALL["depths"]), num_heads=list(SMALL["num_heads"]),
        window_size=SMALL["window_size"], drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    m = SwinModel(cfg)
    m.eval()
    variables = convert_swin_hf(m.state_dict(), SMALL["depths"])
    return m, variables


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_hf():
    import torch
    from transformers.models.swin.modeling_swin import SwinSelfAttention
    from transformers import SwinConfig
    cfg = SwinConfig()
    att = SwinSelfAttention(cfg, dim=32, num_heads=2, window_size=7)
    ours = relative_position_index(7)
    np.testing.assert_array_equal(ours, att.relative_position_index.numpy())


def test_shifted_window_mask_matches_hf(hf_pair):
    import torch
    m, _ = hf_pair
    layer = m.encoder.layers[0].blocks[1]  # shifted block
    ref = layer.get_attn_mask(16, 16, torch.float32, "cpu").numpy()
    ours = shifted_window_mask(16, 16, window=4, shift=2)
    np.testing.assert_array_equal(ours, ref)


def test_parity_small_config(hf_pair):
    import torch
    m, variables = hf_pair
    model = SwinTransformer(**SMALL, use_pallas=False)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    out = model.apply(variables, jnp.array(x))
    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(out.tokens),
                               ref.last_hidden_state.numpy(),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.pooled),
                               ref.pooler_output.numpy(),
                               atol=5e-5, rtol=1e-4)


def test_tiny_224_shapes():
    cfg = SWIN_VARIANTS["tiny-224"]
    model = SwinTransformer(**cfg, use_pallas=False)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
    # last stage dim = 96 * 2^3 = 768, tokens = (224/4/8)^2 = 49
    tokens = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((1, 224, 224, 3))), variables).tokens
    assert tokens.shape == (1, 49, 768)


def test_indivisible_window_raises():
    with pytest.raises(ValueError):
        SwinTransformer(embed_dim=32, depths=(2,), num_heads=(2,),
                        window_size=5, image_size=64,
                        use_pallas=False).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_train_kernel_path_matches_unfused_grads(monkeypatch):
    """SwinBlock's training fast path (structured-backward Pallas kernel,
    DropPath+residual outside) must match the unfused XLA path in value
    AND parameter gradients."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb
    from geovpr.models.swin import SwinBlock

    blk = SwinBlock(dim=128, num_heads=4, resolution=24, window=12,
                    shift=6, drop_path=0.0, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24 * 24, 128))
    v = blk.init(jax.random.PRNGKey(1), x)

    def loss(v, x, det):
        return jnp.sum(blk.apply(v, x, det) ** 2)

    want, gwant = jax.value_and_grad(loss)(v, x, False)  # CPU unfused

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got, ggot = jax.value_and_grad(loss)(v, x, False)    # fused train path
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    flat_w = jax.tree_util.tree_leaves_with_path(gwant)
    flat_g = jax.tree_util.tree_leaves(ggot)
    for (path, a), b in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_train_kernel_under_remat(monkeypatch):
    """nn.remat around a SwinBlock whose train path uses the custom-VJP
    kernel: the rematerialized forward re-enters the kernel during the
    backward — grads must still match the unfused path."""
    import flax.linen as nn
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb
    from geovpr.models.swin import SwinBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12 * 12, 128))

    def build(use_pallas):
        cls = nn.remat(SwinBlock, static_argnums=(2,))
        return cls(dim=128, num_heads=4, resolution=12, window=12,
                   shift=0, drop_path=0.0, use_pallas=use_pallas)

    blk = build(False)
    v = blk.init(jax.random.PRNGKey(1), x, False)
    want, gwant = jax.value_and_grad(
        lambda v: jnp.sum(build(False).apply(v, x, False) ** 2))(v)

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got, ggot = jax.value_and_grad(
        lambda v: jnp.sum(build(True).apply(v, x, False) ** 2))(v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gwant),
                    jax.tree_util.tree_leaves(ggot)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_fused_block_path_matches_unfused(monkeypatch):
    """The fused Pallas half-block path (SwinBlock eval on TPU) must be
    numerically equivalent to the unfused XLA path — including the roll /
    window-partition / residual plumbing around the kernel. Runs the
    kernel in interpreter mode with the backend gate patched to 'tpu'."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb
    from geovpr.models.swin import SwinBlock

    blk = SwinBlock(dim=128, num_heads=4, resolution=24, window=12,
                    shift=6, drop_path=0.0, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24 * 24, 128))
    v = blk.init(jax.random.PRNGKey(1), x)
    want = blk.apply(v, x)          # CPU backend -> unfused XLA path

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    # flip the backend gate so SwinBlock takes the fused path; the kernel
    # itself runs interpreted (the fused path never calls the unfused
    # window_attention op, so the global patch is safe here)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = blk.apply(v, x)           # fused kernel path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_repartition_matches_roll_chain():
    """The single-gather repartition must equal the 3-op
    reverse -> roll -> partition chain it replaces (both directions)."""
    from geovpr.models.swin import repartition

    rng = np.random.default_rng(1)
    h = w = 24
    window, shift = 12, 6
    x = jnp.array(rng.normal(size=(3, h, w, 5)).astype(np.float32))
    xw = window_partition(x, window)
    for s, amt in ((-shift, shift), (shift, -shift)):
        rolled = jnp.roll(window_reverse(xw, window, h, w),
                          shift=(s, s), axis=(1, 2))
        want = window_partition(rolled, window)
        got = repartition(xw, window, h, w, amt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merge_gather_matches_reverse_concat_partition():
    """The single-gather window-resident PatchMerging boundary must equal
    the reverse -> 2x2 HF-order concat -> next-partition chain it replaces,
    and its custom VJP (inverse permutation) must equal the chain's
    gradient."""
    from geovpr.models.swin import merge_gather

    rng = np.random.default_rng(2)
    for res, win, next_win in ((24, 12, 12), (24, 12, 6), (14, 7, 7)):
        c = 6
        x = jnp.array(rng.normal(size=(2, res, res, c)).astype(np.float32))
        xw = window_partition(x, win)

        def chain(xw):
            s = window_reverse(xw, win, res, res)
            m = jnp.concatenate([
                s[:, 0::2, 0::2, :], s[:, 1::2, 0::2, :],
                s[:, 0::2, 1::2, :], s[:, 1::2, 1::2, :],
            ], axis=-1)
            return window_partition(m, next_win)

        want = chain(xw)
        got = merge_gather(xw, res, win, next_win)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        g_want = jax.grad(lambda t: jnp.sum(jnp.sin(chain(t))))(xw)
        g_got = jax.grad(
            lambda t: jnp.sum(jnp.sin(merge_gather(t, res, win,
                                                   next_win))))(xw)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-6, atol=1e-6)


def test_partitioned_block_io_matches_spatial():
    """SwinBlock with partitioned_io=True (resident window-partitioned
    layout) must compute exactly the partition of the spatial block's
    output — shifted and unshifted, on the XLA path."""
    from geovpr.models.swin import SwinBlock

    res, window, c = 24, 12, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (2, res * res, c))
    for shift in (0, 6):
        spatial = SwinBlock(dim=c, num_heads=2, resolution=res,
                            window=window, shift=shift, drop_path=0.0,
                            use_pallas=False)
        part = spatial.clone(partitioned_io=True)
        v = spatial.init(jax.random.PRNGKey(1), x)
        want = spatial.apply(v, x)
        xw = window_partition(x.reshape(2, res, res, c), window)
        got = part.apply(v, xw)
        want_w = window_partition(
            np.asarray(want).reshape(2, res, res, c), window)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_w),
                                   rtol=1e-5, atol=1e-5)


def test_partitioned_transformer_matches(monkeypatch):
    """Full SwinTransformer under the resident-partitioned serving layout
    (backend gate patched to 'tpu'; this SMALL config fails the fused
    kernel's shape gate, so blocks run the XLA fallback *in partitioned
    layout*, exercising stage-boundary conversion + shifted repartition +
    MLP-in-window-layout plumbing) vs the plain CPU path."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_window_attention as pwa

    model = SwinTransformer(**SMALL)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(3), x)
    want = model.apply(v, x).pooled

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pwa.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = model.apply(v, x).pooled
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_partitioned_block_grads_match_spatial():
    """Gradients through the partitioned layout (including the
    custom-VJP inverse-permutation gather of `repartition`) must equal
    the spatial block's gradients."""
    from geovpr.models.swin import SwinBlock

    res, window, c = 24, 12, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (2, res * res, c))
    spatial = SwinBlock(dim=c, num_heads=2, resolution=res, window=window,
                        shift=6, drop_path=0.0, use_pallas=False)
    part = spatial.clone(partitioned_io=True)
    v = spatial.init(jax.random.PRNGKey(1), x)
    xw = window_partition(x.reshape(2, res, res, c), window)

    def loss_spatial(v, x):
        return jnp.sum(spatial.apply(v, x) ** 2)

    def loss_part(v, xw):
        return jnp.sum(part.apply(v, xw) ** 2)

    g_s = jax.grad(loss_spatial)(v, x)
    g_p = jax.grad(loss_part)(v, xw)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        g_s, g_p)
    gx_s = jax.grad(loss_spatial, argnums=1)(v, x)
    gx_p = jax.grad(loss_part, argnums=1)(v, xw)
    np.testing.assert_allclose(
        np.asarray(window_partition(gx_s.reshape(2, res, res, c), window)),
        np.asarray(gx_p), rtol=2e-4, atol=2e-4)


def test_partitioned_transformer_train_mode(monkeypatch):
    """Full model, non-deterministic (DropPath active), partitioned layout
    forced on CPU via the env override: must match the spatial path
    bit-for-bit — the per-image DropPath masks are drawn from the same rng
    streams in both layouts."""
    model = SwinTransformer(**{**SMALL, "drop_path_rate": 0.2},
                            use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(5), x)
    rngs = {"dropout": jax.random.PRNGKey(6)}
    want = model.apply(v, x, deterministic=False, rngs=rngs).pooled
    monkeypatch.setenv("GEOVPR_SWIN_PARTITIONED", "1")
    got = model.apply(v, x, deterministic=False, rngs=rngs).pooled
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the folded merge_gather boundary (measured-futile on chip, kept
    # behind the knob) must stay numerically identical end to end
    monkeypatch.setenv("GEOVPR_SWIN_MERGE_FOLD", "1")
    folded = model.apply(v, x, deterministic=False, rngs=rngs).pooled
    np.testing.assert_allclose(np.asarray(folded), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_alt_layout_transformer_matches(monkeypatch):
    """Full SwinTransformer under the alternating-layout serving mode
    (GEOVPR_SWIN_ALT_LAYOUT: the fused kernels assemble each window-row in
    VMEM from the ±shift-rolled predecessor layout instead of the block
    paying two repartition HBM gathers), including the fused PatchMerging
    boundary kernel. Kernel-ELIGIBLE config (C=128, window 12) with the
    kernels interpreted and the backend gate patched: must equal the
    repartition-based partitioned path to fp32 tolerance (the attention
    kernels are bit-exact — same arithmetic on identically assembled
    windows; the boundary kernel's f32 LN differs from flax's in the last
    ulps) and the plain CPU path likewise."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb

    cfg = dict(embed_dim=128, depths=(2, 2), num_heads=(4, 8),
               window_size=12, image_size=96, drop_path_rate=0.0)
    model = SwinTransformer(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 96, 3))
    v = model.init(jax.random.PRNGKey(3), x)
    want_plain = model.apply(v, x).pooled   # CPU XLA path

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GEOVPR_SWIN_ALT_LAYOUT", "0")
    want_part = model.apply(v, x)
    monkeypatch.setenv("GEOVPR_SWIN_ALT_LAYOUT", "1")
    # exercise the (default-off, measured-futile) fused boundary kernel too
    monkeypatch.setenv("GEOVPR_SWIN_ALT_MERGE", "1")
    got = model.apply(v, x)
    np.testing.assert_allclose(np.asarray(got.tokens),
                               np.asarray(want_part.tokens),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.pooled),
                               np.asarray(want_plain),
                               rtol=5e-5, atol=5e-5)


def test_alt_train_layout_matches(monkeypatch):
    """Full SwinTransformer TRAINING step under the alternating layout
    (GEOVPR_SWIN_ALT_TRAIN=1: fused_swin_attn_train_rolled assembles each
    block's layout in VMEM, returns the assembled stream as the residual
    shortcut, and its VJP converts dx back with one roll_relayout pass) —
    value AND all parameter grads must match both the canonical
    repartition-based train-kernel path and the plain CPU path."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb

    cfg = dict(embed_dim=128, depths=(2, 2), num_heads=(4, 8),
               window_size=12, image_size=96, drop_path_rate=0.0)
    model = SwinTransformer(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 96, 96, 3))
    v = model.init(jax.random.PRNGKey(5), x)

    def loss(v, x):
        return jnp.sum(model.apply(v, x, deterministic=False).pooled ** 2)

    want, gwant = jax.value_and_grad(loss)(v, x)       # plain CPU path

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GEOVPR_SWIN_ALT_TRAIN", "0")
    base, gbase = jax.value_and_grad(loss)(v, x)       # canonical kernels
    monkeypatch.setenv("GEOVPR_SWIN_ALT_TRAIN", "1")
    got, ggot = jax.value_and_grad(loss)(v, x)         # rolled kernels

    np.testing.assert_allclose(float(got), float(base), rtol=1e-5)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    flat_b = jax.tree_util.tree_leaves_with_path(gbase)
    for (path, b), g, w in zip(flat_b, jax.tree_util.tree_leaves(ggot),
                               jax.tree_util.tree_leaves(gwant)):
        msg = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=msg)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=msg)


def test_alt_train_layout_under_remat(monkeypatch):
    """GEOVPR_SWIN_ALT_TRAIN=1 composed with remat (nn.remat re-enters the
    rolled custom-VJP kernels during the backward): grads must match the
    non-remat rolled run exactly and the plain CPU path to tolerance —
    the knob-combination rule (round-4 memory: co-test every pair that
    reshapes shared operands)."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb

    cfg = dict(embed_dim=128, depths=(2,), num_heads=(4,),
               window_size=12, image_size=96, drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 96, 96, 3))
    v = SwinTransformer(**cfg).init(jax.random.PRNGKey(7), x)

    def loss(remat):
        model = SwinTransformer(**cfg, remat=remat)
        return lambda v, x: jnp.sum(
            model.apply(v, x, deterministic=False).pooled ** 2)

    want, gwant = jax.value_and_grad(loss(False))(v, x)   # plain CPU

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GEOVPR_SWIN_ALT_TRAIN", "1")
    base, gbase = jax.value_and_grad(loss(False))(v, x)   # rolled
    got, ggot = jax.value_and_grad(loss(True))(v, x)      # rolled + remat

    np.testing.assert_allclose(float(got), float(base), rtol=1e-5)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    for b, g, w in zip(jax.tree_util.tree_leaves(gbase),
                       jax.tree_util.tree_leaves(ggot),
                       jax.tree_util.tree_leaves(gwant)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3)


def test_repartition_kernel_knob_parity(monkeypatch):
    """GEOVPR_REPARTITION_KERNEL (default ON): the Pallas relayout kernel
    and the XLA row gather must produce identical repartition results and
    VJPs — pinned explicitly so a gate drift can't silently change the
    shipped default's semantics."""
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb
    from geovpr.models.swin import repartition
    from geovpr.ops.pallas_swin_block import roll_relayout_ok

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert roll_relayout_ok(144, 128, 8, 2, 2)
    assert not roll_relayout_ok(144, 128, 8, 1, 1)   # single window
    assert not roll_relayout_ok(49, 128, 8, 2, 2)    # window-7 N

    x = jax.random.normal(jax.random.PRNGKey(9), (8, 144, 128))
    for shift in (6, -6):
        monkeypatch.setenv("GEOVPR_REPARTITION_KERNEL", "0")
        want = repartition(x, 12, 24, 24, shift)
        gw = jax.grad(lambda t: jnp.sum(
            repartition(t, 12, 24, 24, shift) ** 2))(x)
        monkeypatch.setenv("GEOVPR_REPARTITION_KERNEL", "1")
        got = repartition(x, 12, 24, 24, shift)
        gg = jax.grad(lambda t: jnp.sum(
            repartition(t, 12, 24, 24, shift) ** 2))(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gg), np.asarray(gw))

"""Pallas kernel tests — run in interpreter mode on CPU (the kernels target
TPU; interpret=True executes the same program with the Pallas interpreter,
validating logic and masking exactly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl


def _interp():
    return jax.default_backend() != "tpu"


class TestFusedMhsaBlock:
    def test_matches_xla_block(self, monkeypatch):
        """The fused kernel must reproduce LN -> MHSA -> proj -> LayerScale
        -> residual exactly (fp32, small shapes, interpreter mode)."""
        import geovpr.ops.pallas_mhsa as m

        # force interpret mode on CPU by patching pallas_call
        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 5, 16, 4
        rng = np.random.default_rng(0)
        x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
        ln_s = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1 + 1)
        ln_b = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        wqkv = jnp.array(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2)
        bqkv = jnp.array(rng.normal(size=3 * D).astype(np.float32) * 0.1)
        wo = jnp.array(rng.normal(size=(D, D)).astype(np.float32) * 0.2)
        bo = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        gamma = jnp.array(rng.normal(size=D).astype(np.float32) * 0.5)

        got = m.fused_mhsa_block(x, ln_s, ln_b, wqkv, bqkv, wo, bo, gamma, H)

        # XLA reference
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        qkv = h @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, -1)
        dh = D // H

        def heads(t):
            return t.reshape(B, N, H, dh).transpose(0, 2, 1, 3)

        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k)) * dh ** -0.5
        p = jax.nn.softmax(s, -1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        want = x + gamma * (o @ wo + bo)

        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_key_split_fast_path_matches_xla(self, monkeypatch):
        """N = 128k+1 dispatches to the key-split kernel (_mhsa_kernel_v3):
        lane-aligned matmuls + single VPU key, exp2 softmax, deferred
        normalization. Must match the XLA block; tolerance is looser than
        the masked kernel's because deferred normalization reorders the
        f32 rounding (measured ~1e-3 relative worst-case, far below bf16
        noise on the production path)."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 129, 16, 4
        rng = np.random.default_rng(1)
        x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
        ln_s = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1 + 1)
        ln_b = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        wqkv = jnp.array(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2)
        bqkv = jnp.array(rng.normal(size=3 * D).astype(np.float32) * 0.1)
        wo = jnp.array(rng.normal(size=(D, D)).astype(np.float32) * 0.2)
        bo = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        gamma = jnp.array(rng.normal(size=D).astype(np.float32) * 0.5)

        got = m._fused_mhsa_pallas(x, ln_s, ln_b, wqkv, bqkv, wo, bo, gamma,
                                   num_heads=H)
        want = m._mhsa_block_xla(x, ln_s, ln_b, wqkv, bqkv, wo, bo, gamma,
                                 H, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=2e-3)

    def test_bf16_resident_padded_matches_unpadded(self, monkeypatch):
        """bf16 resident-padding serving mode (n_valid on fused_mhsa_block,
        round 3): must agree with the self-padding path on the valid
        rows and return the padded shape."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 129, 16, 4
        NP = -(-N // 16) * 16
        rng = np.random.default_rng(7)
        x = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
        ln_s = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1 + 1)
        ln_b = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        wqkv = jnp.array(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2)
        bqkv = jnp.array(rng.normal(size=3 * D).astype(np.float32) * 0.1)
        wo = jnp.array(rng.normal(size=(D, D)).astype(np.float32) * 0.2)
        bo = jnp.array(rng.normal(size=D).astype(np.float32) * 0.1)
        gamma = jnp.array(rng.normal(size=D).astype(np.float32) * 0.5)
        args = (ln_s, ln_b, wqkv, bqkv, wo, bo, gamma)

        plain = m.fused_mhsa_block(x, *args, num_heads=H)
        xp = jnp.pad(x, [(0, 0), (0, NP - N), (0, 0)])
        padded = m.fused_mhsa_block(xp, *args, num_heads=H, n_valid=N)
        assert padded.shape == (B, NP, D)
        np.testing.assert_array_equal(np.asarray(plain),
                                      np.asarray(padded)[:, :N])

    def test_padding_masked(self, monkeypatch):
        """N=5 pads to 128 inside the kernel; padded keys must not leak
        into the softmax (checked implicitly by the parity test above, and
        explicitly here with adversarial pad-sensitive values)."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 1, 3, 8, 2
        x = jnp.ones((B, N, D), jnp.float32) * 5.0
        eye = jnp.eye(D)
        zeros = jnp.zeros(D)
        out = m.fused_mhsa_block(
            x, jnp.ones(D), zeros, jnp.tile(eye, (1, 3)), jnp.zeros(3 * D),
            eye, zeros, jnp.ones(D), H)
        assert np.isfinite(np.asarray(out)).all()
        # uniform input + LN -> zeros -> attention of zeros -> v=0 -> out=x
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


class TestAttentionOpDispatch:
    def test_window_attention_xla_path(self):
        from geovpr.ops import window_attention
        rng = np.random.default_rng(1)
        q = jnp.array(rng.normal(size=(4, 2, 9, 8)).astype(np.float32))
        bias = jnp.zeros((2, 9, 9))
        out = window_attention(q, q, q, bias, None, use_pallas=False)
        assert out.shape == q.shape

    def test_dinov2_pallas_flag_cpu_fallback(self):
        """use_pallas=True must silently take the XLA path on CPU (backend
        gate), keeping tests and CPU users working."""
        from geovpr.models.dinov2 import DinoV2
        model = DinoV2(hidden_size=32, num_layers=1, num_heads=2,
                       patch_size=14, image_size=28, use_pallas=True)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
        out = model.apply(v, jnp.zeros((2, 28, 28, 3)))
        assert out.tokens.shape == (2, 4, 32)


class TestWindowAttentionPallas:
    def _patch(self, monkeypatch):
        import geovpr.ops.pallas_window_attention as m
        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        return m

    def _mk(self, bw, h, n, dh, nw, with_mask, seed=0):
        rng = np.random.default_rng(seed)
        q, k, v = (jnp.array(rng.normal(size=(bw, h, n, dh)), jnp.float32)
                   for _ in range(3))
        bias = jnp.array(rng.normal(size=(h, n, n)) * 0.2, jnp.float32)
        mask = (jnp.array(np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0),
                          jnp.float32) if with_mask else None)
        return q, k, v, bias, mask

    @pytest.mark.parametrize("case", [
        # (bw, heads, n, dh, nw, with_mask) — n=8: wb=1 slab path;
        # n=4: wb=2, covering both "wb divides nW" and "tile" mask paths
        (8, 2, 8, 4, 4, True),
        (8, 2, 8, 4, 1, False),
        (8, 2, 4, 4, 4, True),    # wb=2 | nW=4 -> slab index path
        (8, 2, 4, 4, 2, True),    # wb=2 == nW -> tile path
        (6, 2, 4, 4, 2, True),    # bw % wb != 0 -> XLA fallback
    ])
    def test_matches_xla(self, monkeypatch, case):
        m = self._patch(monkeypatch)
        from geovpr.ops.window_attention import _window_attention_xla
        bw, h, n, dh, nw, with_mask = case
        q, k, v, bias, mask = self._mk(bw, h, n, dh, nw, with_mask)
        scale = dh ** -0.5
        got = m.window_attention_pallas(q, k, v, bias, mask, scale)
        want = _window_attention_xla(q, k, v, bias, mask, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match_xla(self, monkeypatch):
        m = self._patch(monkeypatch)
        from geovpr.ops.window_attention import _window_attention_xla
        q, k, v, bias, mask = self._mk(4, 2, 8, 4, 4, True)
        scale = 0.5

        def loss_pl(q, k, v, bias):
            return jnp.sum(m.window_attention_pallas(q, k, v, bias, mask,
                                                     scale) ** 2)

        def loss_xla(q, k, v, bias):
            return jnp.sum(_window_attention_xla(q, k, v, bias, mask,
                                                 scale) ** 2)

        g1 = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


class TestFusedMhsaGrads:
    def test_grads_match_xla(self, monkeypatch):
        """The custom VJP (XLA recompute) must make the Pallas forward
        trainable with correct gradients."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 5, 16, 4
        rng = np.random.default_rng(3)
        x = jnp.array(rng.normal(size=(B, N, D)), jnp.float32)
        args = tuple(jnp.array(rng.normal(size=s) * 0.2, jnp.float32)
                     for s in [(D,), (D,), (D, 3 * D), (3 * D,), (D, D),
                               (D,), (D,)])

        def loss_pl(x, *a):
            return jnp.sum(m.fused_mhsa_block(x, *a, num_heads=H) ** 2)

        def loss_xla(x, *a):
            return jnp.sum(m._mhsa_block_xla(x, *a, num_heads=H,
                                             ln_eps=1e-6) ** 2)

        g1 = jax.grad(loss_pl, argnums=tuple(range(8)))(x, *args)
        g2 = jax.grad(loss_xla, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_grads_match_xla_key_split_path(self, monkeypatch):
        """N = 128k+1 routes the TRAIN forward and the attention backward
        through their key-split + stage-split fast paths
        (_mhsa_train_kernel_v3 / _attn_bwd_kernel_v3); gradients must still
        match the XLA block."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 129, 16, 4
        rng = np.random.default_rng(4)
        x = jnp.array(rng.normal(size=(B, N, D)), jnp.float32)
        args = tuple(jnp.array(rng.normal(size=s) * 0.2, jnp.float32)
                     for s in [(D,), (D,), (D, 3 * D), (3 * D,), (D, D),
                               (D,), (D,)])

        def loss_pl(x, *a):
            return jnp.sum(m.fused_mhsa_block(x, *a, num_heads=H) ** 2)

        def loss_xla(x, *a):
            return jnp.sum(m._mhsa_block_xla(x, *a, num_heads=H,
                                             ln_eps=1e-6) ** 2)

        g1 = jax.grad(loss_pl, argnums=tuple(range(8)))(x, *args)
        g2 = jax.grad(loss_xla, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("bwd_all", [True, False])
    def test_packed_train_core_matches_unpacked(self, monkeypatch, bwd_all):
        """The lane-packed ViT training cores (g = 128/dh = 2 at dh=64,
        _packed_stage_split_attention fwd + _packed_masked_bwd_core bwd,
        engaged in both the all-in-one and the split backward) must agree
        with the per-head cores to accumulation-order roundoff. D=128,
        H=2 -> dh=64, g=2; N=129 routes the key-split train fast path."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        monkeypatch.setattr(m, "_BWD_ALL", bwd_all)

        B, N, D, H = 2, 129, 128, 2
        rng = np.random.default_rng(11)
        x = jnp.array(rng.normal(size=(B, N, D)) * 0.5, jnp.float32)
        args = tuple(jnp.array(rng.normal(size=s) * 0.1, jnp.float32)
                     for s in [(D,), (D,), (D, 3 * D), (3 * D,), (D, D),
                               (D,), (D,)])

        def run(packed):
            monkeypatch.setattr(m, "_PACKED_TRAIN", packed)

            def loss(x, *a):
                return jnp.sum(m.fused_mhsa_block(x, *a, num_heads=H) ** 2)

            out = m.fused_mhsa_block(x, *args, num_heads=H)
            grads = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
            return out, grads

        out_u, g_u = run(False)
        out_p, g_p = run(True)
        assert m._pack_group(H, D // H) == 2
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(g_p, g_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-3)

    @pytest.mark.parametrize("case", [(2, 9, 16, 2), (2, 129, 32, 4),
                                      (1, 17, 48, 3)])
    def test_all_in_one_backward_matches_split(self, monkeypatch, case):
        """The all-in-one backward kernel (_mhsa_bwd_all_kernel: out-proj
        grads + attention-core recompute + LN VJP + every weight grad as a
        VMEM accumulator, dx the only stream written) must agree with the
        split composition it replaces to f32 associativity noise — BOTH
        run off the same forward residuals, so this isolates the kernel
        itself from forward-flavor differences."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = case
        rng = np.random.default_rng(11)
        x = jnp.array(rng.normal(size=(B, N, D)), jnp.float32)
        args = tuple(jnp.array(rng.normal(size=s) * 0.2, jnp.float32)
                     for s in [(D,), (D,), (D, 3 * D), (3 * D,), (D, D),
                               (D,), (D,)])
        assert m._bwd_all_ok(-(-N // 16) * 16, D, H, x.dtype)

        def loss(x, *a):
            return jnp.sum(m.fused_mhsa_block(x, *a, num_heads=H) ** 2)

        monkeypatch.setattr(m, "_BWD_ALL", True)
        g_all = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
        monkeypatch.setattr(m, "_BWD_ALL", False)
        g_split = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
        for a, b in zip(g_all, g_split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=1e-6)

    def test_all_in_one_gate_rejects_large_dim(self):
        """D=1024 (ViT-L) needs ~17 MB of f32 weight-grad accumulators —
        must fall back to the split composition."""
        import geovpr.ops.pallas_mhsa as m

        assert not m._bwd_all_ok(272, 1024, 16, jnp.bfloat16)
        assert m._bwd_all_ok(272, 768, 12, jnp.bfloat16)
        # production-scale f32 is rejected (VMEM doubling), tiny f32 passes
        assert not m._bwd_all_ok(272, 768, 12, jnp.float32)


class TestFusedMhsaInt8:
    """The w8a8 serving kernel (`fused_mhsa_block_int8`) only dispatches on
    TPU in production (the model's XLA fallback covers CPU), so interpret
    mode is the only portable check of the kernel body itself — including
    the serving softmax without max-shift (`skip_max`)."""

    def _case(self, rng, D):
        f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
        i8 = lambda *s: jnp.asarray(rng.integers(-127, 128, s), jnp.int8)
        return (f32(D) + 1.0, f32(D), i8(D, 3 * D),
                jnp.abs(f32(3 * D)) * 2e-2 + 1e-3, f32(3 * D), i8(D, D),
                jnp.abs(f32(D)) * 2e-2 + 1e-3, f32(D), f32(D))

    @staticmethod
    def _xla_ref(x, args, H):
        """The same arithmetic as DinoV2Block._attention_int8's XLA
        fallback (geovpr/models/dinov2.py), exp-domain softmax."""
        (ln_scale_q, ln_bias_q, wqkv_q, sqkv_eff, bqkv_eff, wo_q, so_eff,
         bo, gamma) = args
        b, n, d = x.shape
        dh = d // H
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xq = jnp.clip(jnp.round(normed * ln_scale_q + ln_bias_q),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(
            xq.reshape(-1, d), wqkv_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        qkv = (yi.astype(jnp.float32) * sqkv_eff + bqkv_eff
               ).astype(jnp.bfloat16).reshape(b, n, 3 * d)

        def heads(t):
            return t.reshape(b, n, H, dh).transpose(0, 2, 1, 3)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k),
                       preferred_element_type=jnp.float32) * dh ** -0.5
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", p, heads(v),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b * n, d)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        out = yo.astype(jnp.float32) * so_eff + bo
        return (out.reshape(b, n, d) * gamma + xf).astype(x.dtype)

    @pytest.mark.parametrize("skip_max", [False, True])
    def test_kernel_matches_xla_fallback(self, monkeypatch, skip_max):
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        monkeypatch.setattr(m, "_SKIP_MAX", skip_max)

        B, N, D, H = 2, 129, 16, 4
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.float32)
        args = self._case(rng, D)
        got = m.fused_mhsa_block_int8(x, *args, num_heads=H)
        assert got is not None
        want = self._xla_ref(x, args, H)
        # int8 projections are exact in both; differences come from the
        # exp2-domain deferred-norm softmax and the bf16 p cast, amplified
        # by the context round-to-int8 (a near-boundary flip moves one
        # output element by one dequant step)
        err = np.abs(np.asarray(got) - np.asarray(want))
        step = np.asarray(args[6]) * np.asarray(args[8])  # so_eff * gamma
        assert err.max() <= np.abs(step).max() * 1.5 + 1e-3, err.max()

    def test_qk8_kernel_matches_xla_fallback(self, monkeypatch):
        """int8-SCORE mode (cs given): q/k requantized in-kernel, int8
        score matmuls dequantized by cs — vs the identical-arithmetic XLA
        fallback in DinoV2Block._attention_int8. Requantize + int32
        matmuls are bit-exact on both sides; only softmax rounding
        differs."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 129, 16, 4
        dh = D // H
        rng = np.random.default_rng(23)
        x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.float32)
        args = list(self._case(rng, D))
        # keep |q|,|k| in a healthy int8 range; v stays in ctx units
        args[3] = args[3] * jnp.where(jnp.arange(3 * D) < 2 * D, 0.05, 1.0)
        cs = jnp.float32(0.9 * dh ** -0.5)
        got = m.fused_mhsa_block_int8(x, *args, num_heads=H,
                                      cs=cs * m._LOG2E)
        assert got is not None

        (ln_scale_q, ln_bias_q, wqkv_q, sqkv_eff, bqkv_eff, wo_q, so_eff,
         bo, gamma) = args
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xq = jnp.clip(jnp.round(normed * ln_scale_q + ln_bias_q),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(
            xq.reshape(-1, D), wqkv_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        qkv_f = (yi.astype(jnp.float32) * sqkv_eff
                 + bqkv_eff).reshape(B, N, 3 * D)

        def heads(t):
            return t.reshape(B, N, H, dh).transpose(0, 2, 1, 3)

        q8 = jnp.clip(jnp.round(qkv_f[..., :D]), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(qkv_f[..., D:2 * D]), -127,
                      127).astype(jnp.int8)
        v = qkv_f[..., 2 * D:].astype(jnp.bfloat16)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q8), heads(k8),
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * cs
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", p, heads(v),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B * N, D)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        out = yo.astype(jnp.float32) * so_eff + bo
        want = (out.reshape(B, N, D) * gamma + xf).astype(x.dtype)
        err = np.abs(np.asarray(got) - np.asarray(want))
        step = np.asarray(so_eff) * np.asarray(gamma)
        assert err.max() <= np.abs(step).max() * 1.5 + 1e-3, err.max()

    def test_pv8_kernel_matches_reference(self, monkeypatch):
        """int8-PV mode (cpv/cpl given): max-shifted probabilities
        quantized to 127ths, int8 P@V, key-split last key kept f32 via
        cpl. Reference mirrors the kernel's key-split arithmetic
        exactly; requantize + int32 matmuls are bit-exact, softmax
        rounding differs."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, 129, 16, 4
        dh = D // H
        na = N - 1
        rng = np.random.default_rng(29)
        x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.float32)
        args = list(self._case(rng, D))
        # q/k thirds in a healthy int8 range; v third in a_v units
        args[3] = args[3] * jnp.where(jnp.arange(3 * D) < 2 * D, 0.05, 1.0)
        cs = jnp.float32(0.9 * dh ** -0.5)
        a_v_over_actx = jnp.float32(1.7)
        cpv = a_v_over_actx / 127.0
        cpl = a_v_over_actx
        got = m.fused_mhsa_block_int8(x, *args, num_heads=H,
                                      cs=cs * m._LOG2E, cpv=cpv, cpl=cpl)
        assert got is not None

        (ln_scale_q, ln_bias_q, wqkv_q, sqkv_eff, bqkv_eff, wo_q, so_eff,
         bo, gamma) = args
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xq = jnp.clip(jnp.round(normed * ln_scale_q + ln_bias_q),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(
            xq.reshape(-1, D), wqkv_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        qkv_f = (yi.astype(jnp.float32) * sqkv_eff
                 + bqkv_eff).reshape(B, N, 3 * D)

        def heads(t):
            return t.reshape(B, N, H, dh).transpose(0, 2, 1, 3)

        q8 = jnp.clip(jnp.round(qkv_f[..., :D]), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(qkv_f[..., D:2 * D]), -127,
                      127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(qkv_f[..., 2 * D:]), -127,
                      127).astype(jnp.int8)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q8), heads(k8),
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * cs
        sm = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(sm)
        z = jnp.sum(p, axis=-1, keepdims=True)
        v8h = heads(v8)
        pi = jnp.round(p[..., :na] * 127.0).astype(jnp.int8)
        ctx = (jnp.einsum("bhnm,bhmd->bhnd", pi, v8h[:, :, :na],
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32) * cpv
               + p[..., na:] * v8h[:, :, na:na + 1].astype(jnp.float32)
               * cpl) / z
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B * N, D)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        out = yo.astype(jnp.float32) * so_eff + bo
        want = (out.reshape(B, N, D) * gamma + xf).astype(x.dtype)
        err = np.abs(np.asarray(got) - np.asarray(want))
        step = np.asarray(so_eff) * np.asarray(gamma)
        assert err.max() <= np.abs(step).max() * 1.5 + 1e-3, err.max()

    @pytest.mark.parametrize("n_valid", [129])
    def test_resident_padded_matches_unpadded(self, monkeypatch, n_valid):
        """Resident-padding mode (n_valid) must agree with the self-padding
        path on the valid rows."""
        import geovpr.ops.pallas_mhsa as m

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        B, N, D, H = 2, n_valid, 16, 4
        NP = -(-N // 16) * 16
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.normal(size=(B, N, D)) * 0.5, jnp.float32)
        args = self._case(rng, D)
        plain = m.fused_mhsa_block_int8(x, *args, num_heads=H)
        xp = jnp.pad(x, [(0, 0), (0, NP - N), (0, 0)])
        padded = m.fused_mhsa_block_int8(xp, *args, num_heads=H,
                                         n_valid=N)
        assert padded.shape == (B, NP, D)
        np.testing.assert_array_equal(np.asarray(plain),
                                      np.asarray(padded)[:, :N])


class TestFusedSwinAttnBlock:
    """Fused Swin attention half-block (LN1 -> qkv -> window attention
    with relative-position bias / shift mask -> proj -> +residual) vs the
    XLA oracle, interpreter mode on CPU."""

    def _patch(self, monkeypatch):
        import geovpr.ops.pallas_swin_block as m
        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                m.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        return m

    def _mk(self, bw, n, c, h, nw, with_mask, seed=0):
        rng = np.random.default_rng(seed)
        xw = jnp.array(rng.normal(size=(bw, n, c)), jnp.float32)
        ln_s = jnp.array(rng.normal(size=c) * 0.1 + 1, jnp.float32)
        ln_b = jnp.array(rng.normal(size=c) * 0.1, jnp.float32)
        wqkv = jnp.array(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
        bqkv = jnp.array(rng.normal(size=3 * c) * 0.1, jnp.float32)
        wo = jnp.array(rng.normal(size=(c, c)) * 0.1, jnp.float32)
        bo = jnp.array(rng.normal(size=c) * 0.1, jnp.float32)
        bias = jnp.array(rng.normal(size=(h, n, n)) * 0.2, jnp.float32)
        mask = (jnp.array(np.where(rng.random((nw, n, n)) < 0.2, -100.0,
                                   0.0), jnp.float32) if with_mask else None)
        return xw, ln_s, ln_b, wqkv, bqkv, wo, bo, bias, mask

    @pytest.mark.parametrize("case", [
        # (bw, n, c, heads, nw, with_mask)
        (8, 16, 128, 2, 4, True),    # wb=8 spans two mask periods
        (8, 16, 128, 2, 1, False),   # no-mask (shift=0) variant
        (16, 16, 128, 4, 16, True),  # wb < nW -> dynamic mask slicing
        (4, 16, 128, 2, 4, True),    # wb == bw (single program)
        (8, 16, 256, 8, 4, True),    # H=8, dh=32 -> g=4, TWO head groups
                                     # (gi>0 unaligned lane slices)
    ])
    def test_matches_xla(self, monkeypatch, case):
        m = self._patch(monkeypatch)
        # mode "all" packs the serving forward too (default "train" leaves
        # it per-head) so the dh=32 case exercises the packed eval kernel
        monkeypatch.setattr(m, "_PACKED_MODE", "all")
        bw, n, c, h, nw, with_mask = case
        args = self._mk(bw, n, c, h, nw, with_mask)
        got = m.fused_swin_attn_block(*args, h, 1e-5)
        want = m._swin_attn_block_xla(*args, num_heads=h, ln_eps=1e-5)
        assert m.pick_windows_per_program(bw, n, h) > 0
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    def test_packed_core_matches_unpacked(self, monkeypatch):
        """The lane-packed core (g = 128/dh heads per matmul,
        block-diagonal masked operands) must agree with the per-head core
        to f32 accumulation-order roundoff: cross-head products are exact
        zeros, but a longer contraction changes the reduction tree under
        XLA's blocked summation (~1e-7 relative). Exercised at the
        production head geometry (dh=32 -> g=4) with TWO head groups,
        fwd AND grads."""
        m = self._patch(monkeypatch)
        args = self._mk(8, 16, 256, 8, 4, True)
        mask = args[-1]

        def run(packed):
            monkeypatch.setattr(m, "_PACKED_MODE", "all" if packed else "0")

            def loss(*a):
                return jnp.sum(m.fused_swin_attn_train(*a, mask, 8,
                                                       1e-5) ** 2)

            out = m.fused_swin_attn_train(*args, 8, 1e-5)
            grads = jax.grad(loss, argnums=tuple(range(8)))(*args[:-1])
            return out, grads

        out_u, g_u = run(False)
        out_p, g_p = run(True)
        assert m._pack_group(8, 32) == 4
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   rtol=2e-5, atol=2e-5)
        # grads of sum(out^2) reach |g|~60 here; accumulation-order
        # roundoff lands at ~4e-4 absolute on near-zero elements
        for a, b in zip(g_p, g_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-3)

    def test_pack_group_gating(self):
        import geovpr.ops.pallas_swin_block as m

        assert m._pack_group(4, 32) == 4     # Swin-B stage 0
        assert m._pack_group(32, 32) == 4    # Swin-B stage 3
        assert m._pack_group(2, 64) == 2     # dh=64 -> pairs
        assert m._pack_group(2, 128) == 1    # dh=128: already full lanes
        assert m._pack_group(3, 32) == 1     # heads not divisible by g
        assert m._pack_group(4, 48) == 1     # dh does not divide 128
        # default mode "train": serving kernels stay per-head (the packed
        # serving forward measured slower on-chip, docs/DESIGN.md)
        assert m._pack_group(4, 32, train=False) == 1

    def test_ineligible_shapes_fall_back(self, monkeypatch):
        """window-7 (N=49) and C=96 shapes must silently take the XLA
        path inside _forward."""
        m = self._patch(monkeypatch)
        args = self._mk(8, 49, 96, 2, 4, True)
        got = m.fused_swin_attn_block(*args, 2, 1e-5)
        want = m._swin_attn_block_xla(*args, num_heads=2, ln_eps=1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_int8_kernel_matches_xla_int8(self, monkeypatch, with_mask):
        """The w8a8 fused kernel vs the identical-arithmetic XLA fallback
        (SwinBlock._attention_int8): same int8 operands, so only softmax
        rounding differs."""
        from geovpr.ops.quant import quantize_weight
        m = self._patch(monkeypatch)
        bw, n, c, h, nw = 8, 16, 128, 2, 4
        xw, ln_s, ln_b, wqkv, bqkv, wo, bo, bias, mask = self._mk(
            bw, n, c, h, nw, with_mask)
        a_x, a_ctx = 0.11, 0.07     # arbitrary static scales
        wqkv_q, sqkv = quantize_weight(wqkv)
        wo_q, so = quantize_weight(wo)
        vmask = jnp.where(jnp.arange(3 * c) < 2 * c, 1.0, 1.0 / a_ctx)
        args = (ln_s / a_x, ln_b / a_x, wqkv_q, a_x * sqkv * vmask,
                bqkv * vmask, wo_q, a_ctx * so, bo)
        got = m.fused_swin_attn_block_int8(xw, *args, bias, mask, h, 1e-5)
        assert got is not None

        # XLA reference with the same quantized operands
        dh = c // h
        xf = xw.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        xq = jnp.clip(jnp.round(normed * args[0] + args[1]),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(xq.reshape(-1, c), wqkv_q,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        qkv = (yi.astype(jnp.float32) * args[3] + args[4]
               ).astype(jnp.bfloat16).astype(jnp.float32).reshape(bw, n,
                                                                  3 * c)

        def heads(t):
            return t.reshape(bw, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k)) * dh ** -0.5
        s = s + bias[None]
        if with_mask:
            s = (s.reshape(bw // nw, nw, h, n, n)
                 + mask[None, :, None]).reshape(bw, h, n, n)
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", p, heads(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bw * n, c)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        want = (yo.astype(jnp.float32) * args[6] + bo).reshape(bw, n, c) + xf
        # int8 rounding can flip a context unit by +-1 near .5 boundaries;
        # compare on output scale
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.02 * scale, rtol=0.02)

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_int8_qk8_kernel_matches_xla(self, monkeypatch, with_mask):
        """The int8-SCORE serving kernel (cs given: q/k requantized in-
        kernel, int8 x int8 score matmuls dequantized by cs) vs the
        identical-arithmetic XLA fallback in SwinBlock._attention_int8.
        The q/k requantize and the int32 score matmul are bit-exact on
        both sides; only softmax rounding differs."""
        from geovpr.ops.quant import quantize_weight
        m = self._patch(monkeypatch)
        bw, n, c, h, nw = 8, 16, 128, 2, 4
        xw, ln_s, ln_b, wqkv, bqkv, wo, bo, bias, mask = self._mk(
            bw, n, c, h, nw, with_mask)
        dh = c // h
        a_x, a_ctx, a_q, a_k = 0.11, 0.07, 0.05, 0.06
        wqkv_q, sqkv = quantize_weight(wqkv)
        wo_q, so = quantize_weight(wo)
        col3 = jnp.arange(3 * c)
        thirds = jnp.where(col3 < c, 1.0 / a_q,
                           jnp.where(col3 < 2 * c, 1.0 / a_k, 1.0 / a_ctx))
        cs = jnp.float32(a_q * a_k * dh ** -0.5)
        args = (ln_s / a_x, ln_b / a_x, wqkv_q, a_x * sqkv * thirds,
                bqkv * thirds, wo_q, a_ctx * so, bo)
        got = m.fused_swin_attn_block_int8(xw, *args, bias, mask, h, 1e-5,
                                           cs=cs * m._LOG2E)
        assert got is not None

        # XLA reference with the same quantized operands
        xf = xw.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        xq = jnp.clip(jnp.round(normed * args[0] + args[1]),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(xq.reshape(-1, c), wqkv_q,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        qkv_f = (yi.astype(jnp.float32) * args[3]
                 + args[4]).reshape(bw, n, 3 * c)

        def heads(t):
            return t.reshape(bw, n, h, dh).transpose(0, 2, 1, 3)

        q8 = jnp.clip(jnp.round(qkv_f[..., :c]), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(qkv_f[..., c:2 * c]), -127,
                      127).astype(jnp.int8)
        v = qkv_f[..., 2 * c:].astype(jnp.bfloat16).astype(jnp.float32)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q8), heads(k8),
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * cs
        s = s + bias[None]
        if with_mask:
            s = (s.reshape(bw // nw, nw, h, n, n)
                 + mask[None, :, None]).reshape(bw, h, n, n)
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", p, heads(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bw * n, c)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        want = (yo.astype(jnp.float32) * args[6] + bo).reshape(bw, n, c) + xf
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.02 * scale, rtol=0.02)

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_int8_pv8_kernel_matches_xla(self, monkeypatch, with_mask):
        """int8-PV mode on the Swin serving kernel (cpv given): the
        max-shifted probabilities quantize to 127ths and P@V runs int8;
        vs the identical-arithmetic XLA fallback branch in
        SwinBlock._attention_int8."""
        from geovpr.ops.quant import quantize_weight
        m = self._patch(monkeypatch)
        bw, n, c, h, nw = 8, 16, 128, 2, 4
        xw, ln_s, ln_b, wqkv, bqkv, wo, bo, bias, mask = self._mk(
            bw, n, c, h, nw, with_mask)
        dh = c // h
        a_x, a_ctx, a_q, a_k, a_v = 0.11, 0.07, 0.05, 0.06, 0.09
        wqkv_q, sqkv = quantize_weight(wqkv)
        wo_q, so = quantize_weight(wo)
        col3 = jnp.arange(3 * c)
        thirds = jnp.where(col3 < c, 1.0 / a_q,
                           jnp.where(col3 < 2 * c, 1.0 / a_k, 1.0 / a_v))
        cs = jnp.float32(a_q * a_k * dh ** -0.5)
        cpv = jnp.float32(a_v / (127.0 * a_ctx))
        args = (ln_s / a_x, ln_b / a_x, wqkv_q, a_x * sqkv * thirds,
                bqkv * thirds, wo_q, a_ctx * so, bo)
        got = m.fused_swin_attn_block_int8(xw, *args, bias, mask, h, 1e-5,
                                           cs=cs * m._LOG2E, cpv=cpv)
        assert got is not None

        xf = xw.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        xq = jnp.clip(jnp.round(normed * args[0] + args[1]),
                      -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(xq.reshape(-1, c), wqkv_q,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        qkv_f = (yi.astype(jnp.float32) * args[3]
                 + args[4]).reshape(bw, n, 3 * c)

        def heads(t):
            return t.reshape(bw, n, h, dh).transpose(0, 2, 1, 3)

        q8 = jnp.clip(jnp.round(qkv_f[..., :c]), -127, 127).astype(jnp.int8)
        k8 = jnp.clip(jnp.round(qkv_f[..., c:2 * c]), -127,
                      127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(qkv_f[..., 2 * c:]), -127,
                      127).astype(jnp.int8)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(q8), heads(k8),
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * cs
        s = s + bias[None]
        if with_mask:
            s = (s.reshape(bw // nw, nw, h, n, n)
                 + mask[None, :, None]).reshape(bw, h, n, n)
        sm = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(sm)
        z = jnp.sum(p, axis=-1, keepdims=True)
        pi = jnp.round(p * 127.0).astype(jnp.int8)
        ctx = (jnp.einsum("bhnm,bhmd->bhnd", pi, heads(v8),
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32) * cpv / z)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bw * n, c)
        ctxq = jnp.clip(jnp.round(ctx), -127, 127).astype(jnp.int8)
        yo = jax.lax.dot_general(ctxq, wo_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        want = (yo.astype(jnp.float32) * args[6] + bo).reshape(bw, n, c) + xf
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.02 * scale, rtol=0.02)

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_train_forward_matches_xla(self, monkeypatch, with_mask):
        """The training-forward kernel (saves qkv/ctx, no residual) vs the
        XLA oracle's residual=False contract."""
        m = self._patch(monkeypatch)
        args = self._mk(8, 16, 128, 2, 4, with_mask)
        got = m.fused_swin_attn_train(*args, 2, 1e-5)
        want = m._swin_attn_block_xla(*args, num_heads=2, ln_eps=1e-5,
                                      residual=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    @pytest.mark.parametrize("with_mask", [True, False])
    def test_train_structured_backward(self, monkeypatch, with_mask):
        """The structured backward (Pallas dqkv + accumulated rel-pos-bias
        grad + XLA weight grads + exact LN VJP) vs jax.grad of the XLA
        oracle — all eight differentiable inputs including the bias."""
        m = self._patch(monkeypatch)
        args = self._mk(8, 16, 128, 2, 4, with_mask)
        mask = args[-1]

        def loss_tr(*a):
            return jnp.sum(m.fused_swin_attn_train(*a, mask, 2, 1e-5) ** 2)

        def loss_xla(*a):
            return jnp.sum(m._swin_attn_block_xla(
                *a, mask, num_heads=2, ln_eps=1e-5, residual=False) ** 2)

        g1 = jax.grad(loss_tr, argnums=tuple(range(8)))(*args[:-1])
        g2 = jax.grad(loss_xla, argnums=tuple(range(8)))(*args[:-1])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_grads_match_xla(self, monkeypatch):
        m = self._patch(monkeypatch)
        args = self._mk(8, 16, 128, 2, 4, True)
        mask = args[-1]

        def loss_pl(*a):
            return jnp.sum(m.fused_swin_attn_block(*a, mask, 2, 1e-5) ** 2)

        def loss_xla(*a):
            return jnp.sum(m._swin_attn_block_xla(*a, mask, num_heads=2,
                                                  ln_eps=1e-5) ** 2)

        g1 = jax.grad(loss_pl, argnums=tuple(range(8)))(*args[:-1])
        g2 = jax.grad(loss_xla, argnums=tuple(range(8)))(*args[:-1])
        for a, b in zip(g1, g2):
            # grads of sum(out^2) reach |g|~60 at these widths; tolerance
            # matches the MHSA key-split grad test above
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


    def test_int8_qk8_with_packed_all_falls_back_to_unpacked(
            self, monkeypatch):
        """GEOVPR_SWIN_PACKED=all + int8 score matmuls: the qk8 core has
        no lane-packed variant, so the serving entry must force g=1
        (regression: the packed bias prep used to feed the row-stacked
        qk8 core (n, H*n) bias and crash at trace — found by the round-4
        knob re-test on hardware)."""
        from geovpr.ops.quant import quantize_weight
        m = self._patch(monkeypatch)
        bw, n, c, h, nw = 8, 16, 128, 2, 4
        xw, ln_s, ln_b, wqkv, bqkv, wo, bo, bias, mask = self._mk(
            bw, n, c, h, nw, True)
        a_x, a_ctx, a_q, a_k = 0.11, 0.07, 0.05, 0.06
        wqkv_q, sqkv = quantize_weight(wqkv)
        wo_q, so = quantize_weight(wo)
        col3 = jnp.arange(3 * c)
        thirds = jnp.where(col3 < c, 1.0 / a_q,
                           jnp.where(col3 < 2 * c, 1.0 / a_k, 1.0 / a_ctx))
        cs = jnp.float32(a_q * a_k * (c // h) ** -0.5)
        args = (ln_s / a_x, ln_b / a_x, wqkv_q, a_x * sqkv * thirds,
                bqkv * thirds, wo_q, a_ctx * so, bo)
        want = m.fused_swin_attn_block_int8(xw, *args, bias, mask, h, 1e-5,
                                            cs=cs * m._LOG2E)
        monkeypatch.setattr(m, "_PACKED_MODE", "all")
        got = m.fused_swin_attn_block_int8(xw, *args, bias, mask, h, 1e-5,
                                           cs=cs * m._LOG2E)
        assert got is not None
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestFusedMlpInt8Kernel:
    """fused_mlp_block_int8 vs a jnp replica of its exact arithmetic —
    interpreter mode on CPU (on-chip fidelity is asserted by bench.py's
    cosine print). Covers both residual modes: the transformer default
    (residual == kernel input) and ConvNeXt's separate pre-dwconv stream."""

    def _mk(self, monkeypatch, m_rows=20, d=16, hidden=32):
        import geovpr.ops.pallas_mlp as pm

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                pm.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        rng = np.random.default_rng(7)
        x = jnp.array(rng.normal(size=(m_rows, d)).astype(np.float32))
        res = jnp.array(rng.normal(size=(m_rows, d)).astype(np.float32))
        ln_scale_q = jnp.array((rng.normal(size=d) * 0.1 + 8).astype(np.float32))
        ln_bias_q = jnp.array((rng.normal(size=d) * 0.5).astype(np.float32))
        w1q = jnp.array(rng.integers(-127, 128, size=(d, hidden)), jnp.int8)
        s1 = jnp.array((rng.uniform(0.5, 1.5, hidden) * 1e-2).astype(np.float32))
        b1 = jnp.array((rng.normal(size=hidden) * 0.1).astype(np.float32))
        w2q = jnp.array(rng.integers(-127, 128, size=(hidden, d)), jnp.int8)
        s2 = jnp.array((rng.uniform(0.5, 1.5, d) * 1e-2).astype(np.float32))
        b2 = jnp.array((rng.normal(size=d) * 0.1).astype(np.float32))
        gamma = jnp.array((rng.normal(size=d) * 0.5).astype(np.float32))
        inv_a_mid = jnp.float32(37.0)
        return pm, (x, ln_scale_q, ln_bias_q, w1q, s1, b1, w2q, s2, b2,
                    gamma, inv_a_mid), res

    @staticmethod
    def _oracle(x, ln_scale_q, ln_bias_q, w1q, s1, b1, w2q, s2, b2, gamma,
                inv_a_mid, residual, ln_eps=1e-6):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
        xq = jnp.clip(jnp.round(normed * ln_scale_q + ln_bias_q), -127, 127)
        h = (xq @ w1q.astype(jnp.float32)) * s1 + b1
        g = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                      * (h + 0.044715 * h ** 3)))
        gq = jnp.clip(jnp.round(g * inv_a_mid), -127, 127)
        y = (gq @ w2q.astype(jnp.float32)) * s2 + b2
        return y * gamma + residual.astype(jnp.float32)

    def test_self_residual(self, monkeypatch):
        pm, args, _ = self._mk(monkeypatch)
        got = pm.fused_mlp_block_int8(*args)
        want = self._oracle(*args, residual=args[0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_separate_residual(self, monkeypatch):
        pm, args, res = self._mk(monkeypatch)
        got = pm.fused_mlp_block_int8(*args, residual=res)
        want = self._oracle(*args, residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestRolledSwinAttnBlock:
    """Alternating-layout (rolled) serving kernels: the in-VMEM window-row
    assembly (`_roll_assemble` + the two-operand index maps) must make
    `fused_swin_attn_block_rolled` equal the repartition-then-kernel chain
    it replaces, in BOTH roll directions."""

    def _params(self, heads=4, c=128, n=144):
        rng = np.random.default_rng(7)
        f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        return dict(ln_s=f(c) * 0.1 + 1.0, ln_b=f(c) * 0.1,
                    wqkv=f(c, 3 * c) * 0.05, bqkv=f(3 * c) * 0.05,
                    wo=f(c, c) * 0.05, bo=f(c) * 0.05,
                    bias=f(heads, n, n) * 0.02)

    @pytest.mark.parametrize("sign", [1, -1])
    def test_matches_repartition_chain(self, monkeypatch, sign):
        import geovpr.ops.pallas_swin_block as psb
        from geovpr.models.swin import repartition, shifted_window_mask

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                psb.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        h = w = 24
        win, s = 12, 6
        nwx = nwy = 2
        n, c, heads, b = win * win, 128, 4, 2
        bw = b * nwx * nwy
        p = self._params(heads, c, n)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(bw, n, c)).astype(np.float32))
        assert psb.swin_rolled_ok(n, c, bw, heads, nwx, nwy)

        if sign > 0:
            # unshifted stream in -> shifted-grouping attention (masked)
            mask = jnp.asarray(shifted_window_mask(h, w, win, s))
            ref_in = repartition(x, win, h, w, s)
        else:
            # shifted stream in -> unshifted attention (no mask)
            mask = None
            ref_in = repartition(x, win, h, w, -s)
        got = psb.fused_swin_attn_block_rolled(
            x, p["ln_s"], p["ln_b"], p["wqkv"], p["bqkv"], p["wo"],
            p["bo"], p["bias"], mask, heads, sign, win, nwx, nwy)
        want = psb.fused_swin_attn_block(
            ref_in, p["ln_s"], p["ln_b"], p["wqkv"], p["bqkv"], p["wo"],
            p["bo"], p["bias"], mask, heads)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rolled_ok_gate(self):
        from geovpr.ops.pallas_swin_block import swin_rolled_ok

        assert swin_rolled_ok(144, 128, 8, 4, 2, 2)
        assert not swin_rolled_ok(49, 96, 8, 4, 2, 2)    # window-7 N
        assert not swin_rolled_ok(144, 128, 8, 4, 1, 1)  # single window
        assert not swin_rolled_ok(144, 128, 6, 4, 2, 2)  # bw % nW != 0
        # a full window-row of score planes must fit the plane budget
        assert not swin_rolled_ok(144, 128, 1024, 32, 32, 32)


class TestFusedPatchMergeRolled:
    """Fused alt-layout PatchMerging boundary kernel: one pass must equal
    window_reverse -> roll(+shift) -> HF 2x2 concat -> LN -> reduction ->
    next-stage window_partition."""

    @pytest.mark.parametrize("res,c", [(48, 128), (24, 256)])
    def test_matches_boundary_chain(self, monkeypatch, res, c):
        import geovpr.ops.pallas_patch_merge as ppm
        from geovpr.models.swin import window_partition, window_reverse

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                ppm.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        win, shift, b = 12, 6, 2
        nw = (res // win) ** 2
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(b * nw, win * win, c)
                                   ).astype(np.float32))
        ln_s = jnp.asarray(rng.normal(size=4 * c).astype(np.float32) * 0.1
                           + 1.0)
        ln_b = jnp.asarray(rng.normal(size=4 * c).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.normal(size=(4 * c, 2 * c)
                                   ).astype(np.float32) * 0.05)

        got = ppm.fused_patch_merge_rolled(
            x, ln_s, ln_b, w, resolution=res, window=win, next_window=win,
            shift=shift)
        assert got is not None

        xr = jnp.roll(window_reverse(x, win, res, res), (shift, shift),
                      axis=(1, 2))
        m = jnp.concatenate([
            xr[:, 0::2, 0::2, :], xr[:, 1::2, 0::2, :],
            xr[:, 0::2, 1::2, :], xr[:, 1::2, 1::2, :]], axis=-1)
        mf = m.astype(jnp.float32)
        mu = mf.mean(-1, keepdims=True)
        var = ((mf - mu) ** 2).mean(-1, keepdims=True)
        ln = (mf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        want = window_partition(ln @ w, win)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gate(self):
        from geovpr.ops.pallas_patch_merge import patch_merge_rolled_ok

        assert patch_merge_rolled_ok(48, 128, 12, 12, 6, 32)
        assert not patch_merge_rolled_ok(48, 128, 12, 6, 6, 32)  # win change
        assert not patch_merge_rolled_ok(48, 128, 12, 12, 0, 32)  # no shift
        assert not patch_merge_rolled_ok(14, 96, 7, 7, 3, 8)     # c % 128
        assert not patch_merge_rolled_ok(12, 128, 12, 12, 6, 2)  # 1 row


class TestRolledSwinTrain:
    """Alternating-layout TRAINING kernels (round 5): forward (y, x_rolled)
    and ALL grads of the rolled train entry must equal the
    repartition-then-train-kernel chain it replaces — the residual-add
    topology of SwinBlock (out = x_rolled + y) is used as the loss so both
    output cotangents are exercised, in BOTH roll directions."""

    def _params(self, heads=4, c=128, n=144):
        rng = np.random.default_rng(17)
        f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        return dict(ln_s=f(c) * 0.1 + 1.0, ln_b=f(c) * 0.1,
                    wqkv=f(c, 3 * c) * 0.05, bqkv=f(3 * c) * 0.05,
                    wo=f(c, c) * 0.05, bo=f(c) * 0.05,
                    bias=f(heads, n, n) * 0.02)

    @pytest.mark.parametrize("sign", [1, -1])
    def test_train_rolled_matches_repartition_chain(self, monkeypatch,
                                                    sign):
        import geovpr.ops.pallas_swin_block as psb
        from geovpr.models.swin import repartition, shifted_window_mask

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                psb.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        h = w = 24
        win, s = 12, 6
        nwx = nwy = 2
        n, c, heads, b = win * win, 128, 4, 2
        bw = b * nwx * nwy
        p = self._params(heads, c, n)
        rng = np.random.default_rng(18)
        x = jnp.asarray(rng.normal(size=(bw, n, c)).astype(np.float32))
        assert psb.swin_train_rolled_ok(n, c, bw, heads, nwx, nwy)
        mask = (jnp.asarray(shifted_window_mask(h, w, win, s))
                if sign > 0 else None)
        weights = (p["ln_s"], p["ln_b"], p["wqkv"], p["bqkv"], p["wo"],
                   p["bo"], p["bias"])

        def loss_rolled(x, *wts):
            y, xr = psb.fused_swin_attn_train_rolled(
                x, *wts, mask, heads, 1e-5, sign, win, nwx, nwy)
            return jnp.sum((xr + y) ** 2)

        def loss_chain(x, *wts):
            ref_in = repartition(x, win, h, w, sign * s)
            y = psb.fused_swin_attn_train(ref_in, *wts, mask, heads, 1e-5)
            return jnp.sum((ref_in + y) ** 2)

        v1 = loss_rolled(x, *weights)
        v2 = loss_chain(x, *weights)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)

        g1 = jax.grad(loss_rolled, argnums=tuple(range(8)))(x, *weights)
        g2 = jax.grad(loss_chain, argnums=tuple(range(8)))(x, *weights)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("sign", [1, -1])
    def test_roll_relayout_matches_repartition(self, monkeypatch, sign):
        import geovpr.ops.pallas_swin_block as psb
        from geovpr.models.swin import repartition

        orig = pl.pallas_call
        if _interp():
            monkeypatch.setattr(
                psb.pl, "pallas_call",
                lambda *a, **k: orig(*a, **{**k, "interpret": True}))
        h = w = 24
        win, s, nwx, nwy = 12, 6, 2, 2
        n, c, bw = win * win, 128, 2 * nwx * nwy
        rng = np.random.default_rng(19)
        x = jnp.asarray(rng.normal(size=(bw, n, c)).astype(np.float32))
        got = psb.roll_relayout(x, sign, win, nwx, nwy)
        want = repartition(x, win, h, w, sign * s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

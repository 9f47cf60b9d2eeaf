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

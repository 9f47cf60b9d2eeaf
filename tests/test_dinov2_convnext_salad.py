"""Parity tests for DINOv2 and ConvNeXt vs HF (random init), and SALAD
property tests (no offline oracle exists for the hub SALAD weights — the
head is validated on its mathematical contract instead: OT marginals,
descriptor dimensionality, unit norm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geovpr.models.dinov2 import DinoV2
from geovpr.models.convnext import ConvNeXt
from geovpr.models.salad import DinoV2Salad, SaladHead
from geovpr.models.convert_torch import (
    convert_convnext_hf,
    convert_dinov2_hf,
)
from geovpr.ops.sinkhorn import salad_assignment


class TestDinov2Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        from transformers import Dinov2Config, Dinov2Model
        torch.manual_seed(0)
        cfg = Dinov2Config(hidden_size=64, num_hidden_layers=3,
                           num_attention_heads=4, patch_size=14,
                           image_size=56, hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
        m = Dinov2Model(cfg)
        m.eval()
        variables = convert_dinov2_hf(m.state_dict(), num_layers=3)
        model = DinoV2(hidden_size=64, num_layers=3, num_heads=4,
                       patch_size=14, image_size=56)
        return m, model, variables

    def test_forward_parity(self, pair):
        import torch
        m, model, variables = pair
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
        out = model.apply(variables, jnp.array(x))
        with torch.no_grad():
            ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(out.pooled), ref.pooler_output.numpy(),
            atol=5e-5, rtol=1e-4)
        # tokens = last_hidden_state minus CLS
        np.testing.assert_allclose(
            np.asarray(out.tokens), ref.last_hidden_state[:, 1:].numpy(),
            atol=5e-5, rtol=1e-4)

    def test_pos_embed_interpolation(self, pair):
        m, _, _ = pair
        # convert for a different grid: 7x7 instead of 4x4
        variables = convert_dinov2_hf(m.state_dict(), num_layers=3,
                                      target_grid=7)
        assert variables["params"]["pos_embed"].shape == (1, 50, 64)
        model = DinoV2(hidden_size=64, num_layers=3, num_heads=4,
                       patch_size=14, image_size=98)
        out = model.apply(variables, jnp.zeros((1, 98, 98, 3)))
        assert out.tokens.shape == (1, 49, 64)


class TestConvNextParity:
    def test_forward_parity(self):
        import torch
        from transformers import ConvNextConfig, ConvNextModel
        torch.manual_seed(0)
        depths, dims = (2, 2), (32, 64)
        cfg = ConvNextConfig(depths=list(depths), hidden_sizes=list(dims),
                             num_stages=2, drop_path_rate=0.0)
        m = ConvNextModel(cfg)
        m.eval()
        variables = convert_convnext_hf(m.state_dict(), depths)
        model = ConvNeXt(depths=depths, dims=dims)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        out = model.apply(variables, jnp.array(x))
        with torch.no_grad():
            ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(out.pooled), ref.pooler_output.numpy(),
            atol=5e-5, rtol=1e-4)
        tok_ref = ref.last_hidden_state.permute(0, 2, 3, 1).reshape(2, -1, 64)
        np.testing.assert_allclose(np.asarray(out.tokens), tok_ref.numpy(),
                                   atol=5e-5, rtol=1e-4)


class TestSinkhorn:
    def test_marginals(self):
        """After SALAD's rescaling (log_P - norm, then exp), each real
        cluster row of the converged plan sums to 1, and each token column
        (dustbin share included) sums to 1 — i.e. column sums with the
        dustbin removed lie in (0, 1]."""
        rng = np.random.default_rng(2)
        m, n = 8, 32
        scores = jnp.array(rng.normal(size=(2, m, n)).astype(np.float32))
        p = salad_assignment(scores, jnp.array(1.0), num_iters=200)
        row = np.asarray(p.sum(axis=2))
        np.testing.assert_allclose(row, np.ones_like(row), atol=1e-4)
        col = np.asarray(p.sum(axis=1))
        assert (col <= 1.0 + 1e-4).all() and (col > 0).all()
        assert np.asarray(p).min() >= 0.0

    def test_jit_grad(self):
        rng = np.random.default_rng(3)
        scores = jnp.array(rng.normal(size=(1, 4, 16)).astype(np.float32))

        def loss(s, d):
            return jnp.sum(salad_assignment(s, d) ** 2)

        g = jax.jit(jax.grad(loss))(scores, jnp.array(1.0))
        assert np.isfinite(np.asarray(g)).all()


class TestSalad:
    def test_descriptor_contract(self):
        model = DinoV2Salad(variant="small-14", image_size=56)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
        out = model.apply(variables, jnp.ones((2, 56, 56, 3)))
        # 64*128 + 256 = 8448 — the dim the reference's frozen hub model
        # emits (dinov2salad_finetuning.py:29)
        assert out.pooled.shape == (2, 8448)
        norms = np.linalg.norm(np.asarray(out.pooled), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_head_grads_finite(self):
        head = SaladHead(num_clusters=8, cluster_dim=16, token_dim=8, hidden=32)
        tokens = jnp.ones((2, 16, 24))
        cls = jnp.ones((2, 24))
        variables = head.init(jax.random.PRNGKey(0), tokens, cls)

        def loss(v):
            return jnp.sum(head.apply(v, tokens, cls) ** 2)

        g = jax.grad(loss)(variables)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)

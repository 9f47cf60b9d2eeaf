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

    def test_grads_flow_and_finite(self):
        """Training path sanity after the channel MLPs moved into the
        shared Mlp module: every param (dwconv, mlp/fc1, mlp/fc2, gamma,
        norm) gets a finite nonzero gradient."""
        model = ConvNeXt(depths=(1, 1), dims=(16, 32), drop_path_rate=0.1)
        rng = np.random.default_rng(4)
        x = jnp.array(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out = model.apply({"params": params}, x, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out.pooled ** 2)

        grads = jax.grad(loss)(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        assert any("mlp" in jax.tree_util.keystr(p) for p, _ in flat)
        for path, g in flat:
            a = np.asarray(g)
            assert np.isfinite(a).all(), jax.tree_util.keystr(path)
            assert np.abs(a).max() > 0, jax.tree_util.keystr(path)


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


class TestSaladHubConverter:
    """Converter parity against a torch replica of the serizba/salad hub
    VPRModel (facebookresearch-dinov2 fused-qkv backbone + SALAD aggregator
    with SuperGlue-style dustbin OT, 3 log-space iterations). Real hub
    weights are not fetchable offline; the replica pins the exact state_dict
    layout and math the converter must map
    (`dinov2salad/dinov2salad_finetuning.py:19,92` consumes the hub model as
    a frozen black box emitting 8448-dim descriptors)."""

    D, NL, NH, PATCH, IMG = 64, 2, 4, 14, 56
    K, CD, TD, HID = 8, 16, 24, 32

    def _torch_model(self):
        import torch
        import torch.nn as tnn
        import torch.nn.functional as F

        D, NL, NH, PATCH, IMG = self.D, self.NL, self.NH, self.PATCH, self.IMG
        K, CD, TD, HID = self.K, self.CD, self.TD, self.HID

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(D, eps=1e-6)
                self.attn = tnn.Module()
                self.attn.qkv = tnn.Linear(D, 3 * D)
                self.attn.proj = tnn.Linear(D, D)
                self.ls1 = tnn.Module()
                self.ls1.gamma = tnn.Parameter(torch.randn(D) * 0.1)
                self.norm2 = tnn.LayerNorm(D, eps=1e-6)
                self.mlp = tnn.Module()
                self.mlp.fc1 = tnn.Linear(D, 4 * D)
                self.mlp.fc2 = tnn.Linear(4 * D, D)
                self.ls2 = tnn.Module()
                self.ls2.gamma = tnn.Parameter(torch.randn(D) * 0.1)

            def forward(self, x):
                h = self.norm1(x)
                b, n, _ = h.shape
                qkv = self.attn.qkv(h).reshape(b, n, 3, NH, D // NH)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                o = F.scaled_dot_product_attention(q, k, v)
                o = o.transpose(1, 2).reshape(b, n, D)
                x = x + self.ls1.gamma * self.attn.proj(o)
                return x + self.ls2.gamma * self.mlp.fc2(
                    F.gelu(self.mlp.fc1(self.norm2(x))))

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                g = IMG // PATCH
                self.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
                self.pos_embed = tnn.Parameter(
                    torch.randn(1, 1 + g * g, D) * 0.02)
                self.patch_embed = tnn.Module()
                self.patch_embed.proj = tnn.Conv2d(3, D, PATCH, PATCH)
                self.blocks = tnn.ModuleList([Block() for _ in range(NL)])
                self.norm = tnn.LayerNorm(D, eps=1e-6)

            def forward(self, x):
                b = x.shape[0]
                h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                h = torch.cat([self.cls_token.expand(b, -1, -1), h], 1)
                h = h + self.pos_embed
                for blk in self.blocks:
                    h = blk(h)
                h = self.norm(h)
                return h[:, 1:], h[:, 0]

        class Aggregator(tnn.Module):
            def __init__(self):
                super().__init__()
                self.cluster_features = tnn.Sequential(
                    tnn.Conv2d(D, HID, 1), tnn.ReLU(), tnn.Conv2d(HID, CD, 1))
                self.score = tnn.Sequential(
                    tnn.Conv2d(D, HID, 1), tnn.ReLU(), tnn.Conv2d(HID, K, 1))
                self.token_features = tnn.Sequential(
                    tnn.Linear(D, HID), tnn.ReLU(), tnn.Linear(HID, TD))
                self.dust_bin = tnn.Parameter(torch.tensor(1.0))

            def forward(self, tokens, cls):
                b, n, _ = tokens.shape
                g = int(n ** 0.5)
                fmap = tokens.transpose(1, 2).reshape(b, D, g, g)
                f = self.cluster_features(fmap).flatten(2)   # (B, CD, N)
                s = self.score(fmap).flatten(2)              # (B, K, N)
                t = self.token_features(cls)                 # (B, TD)
                m = K
                sc = torch.cat(
                    [s, self.dust_bin.expand(b, 1, n)], 1)   # (B, K+1, N)
                norm = -torch.log(torch.tensor(float(n + m)))
                log_a = torch.full((m + 1,), norm)
                log_a[-1] = torch.log(torch.tensor(float(n - m))) + norm
                log_b = torch.full((n,), norm)
                u, v = torch.zeros(b, m + 1), torch.zeros(b, n)
                for _ in range(3):
                    u = log_a[None] - torch.logsumexp(sc + v[:, None, :], 2)
                    v = log_b[None] - torch.logsumexp(sc + u[:, :, None], 1)
                p = torch.exp(sc + u[:, :, None] + v[:, None, :] - norm)
                p = p[:, :-1]                                # drop dustbin
                agg = torch.einsum("bkn,bdn->bkd", p, f)     # (B, K, CD)
                agg = F.normalize(agg, p=2, dim=-1).flatten(1)
                out = torch.cat([F.normalize(t, p=2, dim=-1), agg], -1)
                return F.normalize(out, p=2, dim=-1)

        class VPRModel(tnn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = Backbone()
                self.aggregator = Aggregator()

            def forward(self, x):
                return self.aggregator(*self.backbone(x))

        torch.manual_seed(0)
        return VPRModel().eval()

    def test_descriptor_parity(self):
        import torch
        import flax.linen as nn

        torch_model = self._torch_model()
        from geovpr.models.convert_torch import convert_salad_hub
        variables = convert_salad_hub(torch_model.state_dict(),
                                      num_layers=self.NL,
                                      target_grid=self.IMG // self.PATCH)

        outer = self

        class TinySalad(nn.Module):
            @nn.compact
            def __call__(self, x):
                out = DinoV2(hidden_size=outer.D, num_layers=outer.NL,
                             num_heads=outer.NH, patch_size=outer.PATCH,
                             image_size=outer.IMG, name="backbone")(x)
                return SaladHead(num_clusters=outer.K, cluster_dim=outer.CD,
                                 token_dim=outer.TD, hidden=outer.HID,
                                 name="salad")(out.tokens, out.cls)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, self.IMG, self.IMG, 3)).astype(np.float32)
        got = TinySalad().apply(variables, jnp.array(x))
        with torch.no_grad():
            want = torch_model(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        assert got.shape == want.shape == (2, self.K * self.CD + self.TD)
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-4, rtol=1e-3)

    def test_pos_embed_interpolated(self):
        torch_model = self._torch_model()
        from geovpr.models.convert_torch import convert_salad_hub
        v = convert_salad_hub(torch_model.state_dict(), num_layers=self.NL,
                              target_grid=7)
        assert v["params"]["backbone"]["pos_embed"].shape == (1, 50, self.D)

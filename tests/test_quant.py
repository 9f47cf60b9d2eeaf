"""w8a8 serving-path quantization (geovpr/ops/quant.py,
geovpr/models/quantize.py, Mlp int8/calibrate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geovpr.models.layers import Mlp
from geovpr.models.quantize import quantize_for_serving
from geovpr.models.salad import DinoV2Salad
from geovpr.ops.quant import int8_dense, quantize_weight


class TestQuantPrimitives:
    def test_weight_roundtrip(self, rng):
        w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
        wq, s = quantize_weight(w)
        assert wq.dtype == jnp.int8 and s.shape == (32,)
        back = np.asarray(wq, np.float32) * np.asarray(s)
        # per-out-channel symmetric: worst-case error is half a step
        step = np.asarray(s)
        assert (np.abs(back - w) <= 0.5 * step[None, :] + 1e-7).all()

    def test_int8_dense_matches_f32(self, rng):
        x = rng.normal(size=(16, 64)).astype(np.float32)
        w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
        b = rng.normal(size=(32,)).astype(np.float32) * 0.01
        wq, ws = quantize_weight(w)
        a_scale = jnp.float32(np.abs(x).max() / 127.0)
        got = np.asarray(int8_dense(jnp.asarray(x), a_scale, wq, ws,
                                    jnp.asarray(b)))
        want = x @ w + b
        # int8 x int8 with 64-deep accumulation: ~1% relative
        assert np.abs(got - want).max() <= 0.03 * np.abs(want).max()


class TestMlpInt8:
    def test_quantized_forward_close_to_f32(self, rng):
        model = Mlp(hidden_dim=64, out_dim=16, int8=True)
        x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert "quant" in variables            # declared at init (zeros)

        variables = quantize_for_serving(
            # Mlp itself has the int8/calibrate fields -> clone works
            model, {"params": variables["params"]}, [x])
        got = np.asarray(model.apply(variables, x))
        want = np.asarray(
            model.clone(int8=False).apply(
                {"params": variables["params"]}, x))
        assert np.abs(got - want).max() <= 0.05 * (np.abs(want).max() + 1e-6)

    def test_calibrate_flag_sows_amax(self, rng):
        model = Mlp(hidden_dim=8, calibrate=True)
        x = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, st = model.apply({"params": variables["params"]}, x,
                            mutable=["quant_calib"])
        leaves = st["quant_calib"]
        assert "a_in" in leaves and "a_mid" in leaves
        np.testing.assert_allclose(np.asarray(leaves["a_in"][0]),
                                   np.abs(np.asarray(x)).max(), rtol=1e-6)

    def test_int8_off_leaves_variables_unchanged(self, rng):
        """int8=False (the training default) must not add any collection —
        checkpoint trees stay identical to round-1 models."""
        model = Mlp(hidden_dim=8)
        x = jnp.zeros((2, 4))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert set(variables) == {"params"}


class TestDinoV2SaladInt8:
    def test_end_to_end_descriptor_fidelity(self, rng):
        model = DinoV2Salad(variant="small-14", image_size=28,
                            num_clusters=8, cluster_dim=16, token_dim=16,
                            int8_mlp=True)
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        d_q = np.asarray(model.apply(variables, x).pooled, np.float32)
        d_f = np.asarray(
            model.clone(int8_mlp=False).apply(
                {"params": variables["params"]}, x).pooled, np.float32)
        cos = (d_q * d_f).sum(-1) / (
            np.linalg.norm(d_q, axis=-1) * np.linalg.norm(d_f, axis=-1))
        assert cos.min() > 0.995, cos

    def test_quant_collection_structure(self, rng):
        model = DinoV2Salad(variant="small-14", image_size=28,
                            num_clusters=8, cluster_dim=16, token_dim=16,
                            int8_mlp=True)
        x = jnp.zeros((1, 28, 28, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = quantize_for_serving(
            model, {"params": variables["params"]}, [jnp.ones_like(x)])
        q = out["quant"]["backbone"]
        assert set(q) == {f"block{i}" for i in range(12)}
        b0 = q["block0"]["mlp"]
        assert b0["fc1_kernel_q"].dtype == jnp.int8
        assert b0["fc1_kernel_q"].shape == (384, 4 * 384)
        assert float(b0["a_in_scale"]) > 0

    def test_int8_attn_descriptor_fidelity(self, rng):
        """w8a8 attention projections (XLA fallback path on CPU) on top of
        the int8 MLPs — the full serving configuration."""
        model = DinoV2Salad(variant="small-14", image_size=28,
                            num_clusters=8, cluster_dim=16, token_dim=16,
                            int8_mlp=True, int8_attn=True)
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        q = variables["quant"]["backbone"]["block0"]
        assert q["attn_wqkv_q"].dtype == jnp.int8
        assert q["attn_wqkv_q"].shape == (384, 3 * 384)
        assert float(q["attn_a_ctx"]) > 0
        d_q = np.asarray(model.apply(variables, x).pooled, np.float32)
        d_f = np.asarray(
            model.clone(int8_mlp=False, int8_attn=False).apply(
                {"params": variables["params"]}, x).pooled, np.float32)
        cos = (d_q * d_f).sum(-1) / (
            np.linalg.norm(d_q, axis=-1) * np.linalg.norm(d_f, axis=-1))
        assert cos.min() > 0.99, cos

    def test_swin_int8_forward_close(self, rng):
        """int8_mlp threads through Swin too (every backbone sharing Mlp)."""
        from geovpr.models.swin import SwinTransformer

        model = SwinTransformer(embed_dim=32, depths=(1, 1),
                                num_heads=(2, 4), window_size=4,
                                image_size=32, patch_size=4,
                                use_pallas=False, int8_mlp=True)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        got = np.asarray(model.apply(variables, x).pooled, np.float32)
        want = np.asarray(
            model.clone(int8_mlp=False).apply(
                {"params": variables["params"]}, x).pooled, np.float32)
        assert np.abs(got - want).max() <= 0.05 * (np.abs(want).max() + 1e-6)

    def test_swin_int8_attn_forward_close(self, rng):
        """w8a8 attention projections on Swin (XLA window-attention
        fallback on CPU) on top of the int8 MLPs — the full Swin serving
        configuration, including a shifted block (mask path)."""
        from geovpr.models.swin import SwinTransformer

        model = SwinTransformer(embed_dim=32, depths=(2,), num_heads=(2,),
                                window_size=4, image_size=32, patch_size=4,
                                use_pallas=False, int8_mlp=True,
                                int8_attn=True)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        q = variables["quant"]["stage0_block0"]
        assert q["attn_wqkv_q"].dtype == jnp.int8
        assert q["attn_wqkv_q"].shape == (32, 96)
        assert float(q["attn_a_ctx"]) > 0
        got = np.asarray(model.apply(variables, x).pooled, np.float32)
        want = np.asarray(
            model.clone(int8_mlp=False, int8_attn=False).apply(
                {"params": variables["params"]}, x).pooled, np.float32)
        assert np.abs(got - want).max() <= 0.05 * (np.abs(want).max() + 1e-6)

    def test_convnext_int8_forward_close(self, rng):
        """ConvNeXt's channel MLPs ride the same w8a8 stack (the block's
        residual is the PRE-dwconv stream — the fused_residual path)."""
        from geovpr.models.convnext import ConvNeXt

        model = ConvNeXt(depths=(1, 1), dims=(16, 32), int8_mlp=True)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        q = variables["quant"]["stage0_block0"]["mlp"]
        assert q["fc1_kernel_q"].dtype == jnp.int8
        assert q["fc1_kernel_q"].shape == (16, 64)
        got = np.asarray(model.apply(variables, x).pooled, np.float32)
        want = np.asarray(
            model.clone(int8_mlp=False).apply(
                {"params": variables["params"]}, x).pooled, np.float32)
        assert np.abs(got - want).max() <= 0.05 * (np.abs(want).max() + 1e-6)

    def test_mlp_fused_residual_xla_fallback(self, rng):
        """fused_residual must add the GIVEN stream, not the kernel input
        (the XLA fallback path that CPU serving runs)."""
        model = Mlp(hidden_dim=32, out_dim=16, int8=True)
        x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        res = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        variables = quantize_for_serving(
            model, {"params": variables["params"]}, [x])
        ln_scale = jnp.ones((16,), jnp.float32)
        ln_bias = jnp.zeros((16,), jnp.float32)
        gamma = jnp.full((16,), 0.5, jnp.float32)
        fused = (ln_scale, ln_bias, gamma, 1e-6)
        base = np.asarray(model.apply(variables, x, fused=fused))
        got = np.asarray(model.apply(variables, x, fused=fused,
                                     fused_residual=res))
        np.testing.assert_allclose(got, base - np.asarray(x) + np.asarray(res),
                                   rtol=1e-5, atol=1e-5)

    def test_missing_calibration_raises(self):
        model = DinoV2Salad(variant="small-14", image_size=28,
                            num_clusters=8, cluster_dim=16, token_dim=16)
        with pytest.raises(ValueError):
            quantize_for_serving(model, {"params": {}}, [])


class TestTrainerInt8Serving:
    """Trainer.enable_int8_serving: the CLI-facing int8 eval path
    (cli/evaluate --int8, and the same plumbing cli/fuse reuses)."""

    def _trainer(self, tmp_path):
        from geovpr.core.config import (DataConfig, ModelConfig, OptimConfig,
                                        TrainConfig)
        from geovpr.objectives.workloads import GeoposeObjective
        from geovpr.objectives.scaler import ScalerState
        from geovpr.parallel import create_mesh
        from geovpr.train import Trainer
        from geovpr.train.model import RegressionModel

        cfg = ModelConfig(family="dinov2", variant="small-14",
                          image_size=28, head="mlp", head_hidden=16)
        trainer = Trainer(
            model=RegressionModel(config=cfg),
            objective=GeoposeObjective(),
            optim_cfg=OptimConfig(lr=1e-3, schedule="constant"),
            train_cfg=TrainConfig(epochs=1, seed=0,
                                  save_dir=str(tmp_path)),
            data_cfg=DataConfig(batch_size=8, image_size=28),
            mesh=create_mesh(),
            scaler=ScalerState(mean=jnp.zeros(2), scale=jnp.ones(2)),
            run_dir=str(tmp_path / "run"))
        trainer.init_state((28, 28, 3))
        return trainer

    def _source(self, n=16, size=28, seed=3):
        from geovpr.data.pipeline import ArraySource
        rng = np.random.default_rng(seed)
        return ArraySource(
            images=rng.integers(0, 255, (n, size, size, 3),
                                dtype=np.uint8),
            targets=rng.normal(size=(n, 2)).astype(np.float32))

    def test_int8_eval_matches_f32(self, tmp_path):
        trainer = self._trainer(tmp_path)
        source = self._source()
        m_f32, p_f32 = trainer.evaluate_and_predict(source)
        trainer.enable_int8_serving(source)
        assert trainer._extra_eval_vars is not None
        assert "quant" in trainer._extra_eval_vars
        m_int8, p_int8 = trainer.evaluate_and_predict(source)
        # random-init head outputs are tiny; compare on scale
        scale = np.abs(p_f32).max() + 1e-6
        assert np.abs(p_int8 - p_f32).max() <= 0.05 * scale
        # metrics stay in the same ballpark (sanity, random weights)
        assert np.isfinite(m_int8["mse"]) and np.isfinite(m_f32["mse"])

    def test_unsupported_family_raises(self, tmp_path):
        from geovpr.models.registry import build_backbone, supports_int8
        from geovpr.core.config import ModelConfig
        assert not supports_int8("efficientnet")
        with pytest.raises(ValueError, match="int8"):
            build_backbone(ModelConfig(family="efficientnet", variant="b0"),
                           int8=True)


def test_swin_int8_alt_layout_matches(monkeypatch):
    """w8a8 Swin serving under the alternating layout
    (GEOVPR_SWIN_ALT_LAYOUT) must closely match the repartition-based
    int8 path (kernels interpreted, backend gate patched). The attention
    kernels are bit-exact; the fused PatchMerging boundary kernel's f32
    LN vs flax's bf16 LN moves a few int8 quantization decisions, so the
    comparison carries a small tolerance (measured: tokens ≤1.3% of max,
    pooled cosine ≥ 0.999997)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from unittest import mock
    from jax.experimental import pallas as pl
    import geovpr.ops.pallas_swin_block as psb
    from geovpr.models.swin import SwinTransformer
    from geovpr.models.quantize import quantize_for_serving

    model = SwinTransformer(embed_dim=128, depths=(2, 2), num_heads=(4, 8),
                            window_size=12, image_size=96, patch_size=4,
                            drop_path_rate=0.0, int8_mlp=True,
                            int8_attn=True)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    orig = pl.pallas_call
    monkeypatch.setattr(
        psb.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    variables = quantize_for_serving(
        model, {"params": variables["params"]}, [x])
    monkeypatch.setenv("GEOVPR_SWIN_ALT_LAYOUT", "0")
    want = model.apply(variables, x)
    monkeypatch.setenv("GEOVPR_SWIN_ALT_LAYOUT", "1")
    # exercise the (default-off, measured-futile) fused boundary kernel too
    monkeypatch.setenv("GEOVPR_SWIN_ALT_MERGE", "1")
    got = model.apply(variables, x)
    gt, wt = np.asarray(got.tokens), np.asarray(want.tokens)
    assert np.abs(gt - wt).max() <= 0.05 * np.abs(wt).max()
    gp, wp = np.asarray(got.pooled), np.asarray(want.pooled)
    cos = (gp * wp).sum(-1) / (np.linalg.norm(gp, axis=-1)
                               * np.linalg.norm(wp, axis=-1))
    assert cos.min() >= 0.9999

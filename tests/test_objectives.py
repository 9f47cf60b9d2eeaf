"""Unit tests for losses, angle codecs, and the scaler codec.

Parity oracles: hand-computed values, torch.nn losses (CPU), and sklearn's
StandardScaler — the exact primitives the reference scripts used.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from geovpr.objectives import (
    SinCosCodec,
    acos_angular_loss_deg,
    angular_error_deg,
    competition_loss,
    fit_scaler,
    huber_loss,
    maae_deg,
    mse_loss,
    wrap_degrees,
)
from geovpr.objectives.losses import geopose_metrics


class TestMAAE:
    def test_hand_values(self):
        pred = jnp.array([10.0, 350.0, 0.0, 180.0])
        true = jnp.array([350.0, 10.0, 359.0, 0.0])
        # wraparound: 20, 20, 1, 180
        np.testing.assert_allclose(
            angular_error_deg(pred, true), [20.0, 20.0, 1.0, 180.0], atol=1e-5)
        np.testing.assert_allclose(maae_deg(pred, true), 55.25, atol=1e-4)

    def test_angles_above_360(self):
        # train manifest contains angles up to 750 (SURVEY §2.3 row 23)
        np.testing.assert_allclose(
            angular_error_deg(jnp.array([750.0]), jnp.array([30.0])), [0.0],
            atol=1e-4)

    def test_masked(self):
        pred = jnp.array([10.0, 0.0])
        true = jnp.array([20.0, 180.0])
        mask = jnp.array([True, False])
        np.testing.assert_allclose(maae_deg(pred, true, mask), 10.0, atol=1e-5)


class TestHuber:
    def test_matches_torch(self):
        import torch
        rng = np.random.default_rng(1)
        p = rng.normal(size=(32, 2)).astype(np.float32)
        t = rng.normal(size=(32, 2)).astype(np.float32)
        for delta in (0.5, 1.0, 2.0):
            ours = float(huber_loss(jnp.array(p), jnp.array(t), delta=delta))
            theirs = float(torch.nn.HuberLoss(delta=delta)(
                torch.from_numpy(p), torch.from_numpy(t)))
            assert abs(ours - theirs) < 1e-6

    def test_mse_matches_torch(self):
        import torch
        rng = np.random.default_rng(2)
        p = rng.normal(size=(16, 2)).astype(np.float32)
        t = rng.normal(size=(16, 2)).astype(np.float32)
        ours = float(mse_loss(jnp.array(p), jnp.array(t)))
        theirs = float(torch.nn.MSELoss()(torch.from_numpy(p), torch.from_numpy(t)))
        assert abs(ours - theirs) < 1e-6


class TestCodec:
    @pytest.mark.parametrize("order", ["cos_sin", "sin_cos"])
    def test_roundtrip(self, order):
        codec = SinCosCodec(order)
        deg = jnp.array([0.0, 45.0, 90.0, 180.0, 270.0, 359.5, 730.0])
        out = codec.decode(codec.encode(deg))
        np.testing.assert_allclose(out, np.mod(deg, 360.0), atol=1e-3)

    def test_cos_sin_matches_efficientnet_reference_convention(self):
        # en_finetuning_gemini.py:60 stores [cos, sin]; :221 decodes
        # atan2(x[:,1], x[:,0]).
        codec = SinCosCodec("cos_sin")
        enc = np.asarray(codec.encode(jnp.array([30.0])))
        np.testing.assert_allclose(
            enc[0], [np.cos(np.deg2rad(30)), np.sin(np.deg2rad(30))], atol=1e-6)
        dec = np.rad2deg(np.arctan2(enc[:, 1], enc[:, 0])) % 360
        np.testing.assert_allclose(np.asarray(codec.decode(jnp.array(enc))), dec,
                                   atol=1e-4)

    def test_sin_cos_matches_swin_reference_convention(self):
        # swin_angle_finetuning_sin_cos.py:47 stores [sin, cos]; :73 decodes
        # atan2(x[:,0], x[:,1]).
        codec = SinCosCodec("sin_cos")
        enc = np.asarray(codec.encode(jnp.array([200.0])))
        dec = (np.rad2deg(np.arctan2(enc[:, 0], enc[:, 1])) + 360) % 360
        np.testing.assert_allclose(np.asarray(codec.decode(jnp.array(enc))), dec,
                                   atol=1e-4)

    def test_normalize_unit(self):
        codec = SinCosCodec()
        x = jnp.array([[3.0, 4.0]])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(codec.normalize(x))), 1.0, atol=1e-5)

    def test_flip_remap(self):
        codec = SinCosCodec()
        np.testing.assert_allclose(
            np.asarray(codec.flip_horizontal(jnp.array([0.0, 90.0, 180.0, 270.0]))),
            [180.0, 90.0, 0.0, 270.0], atol=1e-5)

    def test_wrap(self):
        np.testing.assert_allclose(
            np.asarray(wrap_degrees(jnp.array([750.0, -10.0]))),
            [30.0, 350.0], atol=1e-4)


class TestAcosLoss:
    def test_known_angle(self):
        codec = SinCosCodec("sin_cos")
        a = codec.encode(jnp.array([0.0]))
        b = codec.encode(jnp.array([90.0]))
        assert abs(float(acos_angular_loss_deg(a, b)) - 90.0) < 1e-2


class TestScaler:
    def test_matches_sklearn(self):
        from sklearn.preprocessing import StandardScaler
        rng = np.random.default_rng(3)
        x = rng.normal(loc=[219000, 143000], scale=[900, 1200],
                       size=(200, 2)).astype(np.float64)
        sk = StandardScaler().fit(x)
        ours = fit_scaler(jnp.array(x, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(ours.mean), sk.mean_, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.scale), sk.scale_, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ours.transform(jnp.array(x, jnp.float32))),
            sk.transform(x), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(ours.inverse_transform(ours.transform(jnp.array(x, jnp.float32)))),
            x, rtol=1e-5)

    def test_zero_variance_column(self):
        x = jnp.array([[1.0, 5.0], [1.0, 7.0]])
        s = fit_scaler(x)
        assert float(s.scale[0]) == 1.0


class TestGeoposeMetrics:
    def test_competition_loss_equals_mean_axis_mse(self):
        rng = np.random.default_rng(4)
        p = jnp.array(rng.normal(size=(50, 2)), jnp.float32)
        t = jnp.array(rng.normal(size=(50, 2)), jnp.float32)
        comp = float(competition_loss(p, t))
        per_axis_mse = np.mean((np.asarray(p) - np.asarray(t)) ** 2, axis=0)
        np.testing.assert_allclose(comp, 0.5 * per_axis_mse.sum(), rtol=1e-5)
        m = geopose_metrics(p, t)
        np.testing.assert_allclose(float(m["mse"]), comp, rtol=1e-5)
        np.testing.assert_allclose(float(m["rmse"]), np.sqrt(comp), rtol=1e-5)

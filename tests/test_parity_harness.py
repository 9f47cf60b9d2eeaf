"""CI for the real-weights parity harness (`geovpr.cli.parity`).

The real assets (trained reference checkpoints + IIIT-campus images) are
gitignored out of the reference snapshot, so each leg runs here on a
SYNTHETIC STAND-IN: a torch model in the exact reference checkpoint layout
(same module names, same Sequential indices), whose own predictions define
the golden metrics written to parity_config.json. A passing run proves the
whole protocol end to end — torch checkpoint load -> full-model conversion
(backbone + trained head) -> preset eval over decoded images -> metric
thresholds -> JSON report — so pointing --assets at the real files is the
only remaining step in an environment that has them.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image  # noqa: E402

from geovpr.cli import parity  # noqa: E402

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _write_assets(root, n=6, size=56, seed=0):
    """images/ + labels_val.csv in the reference schema; returns
    (uint8 images (n,size,size,3), latlon (n,2), angles (n,))."""
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    lat = 219000 + rng.uniform(0, 2000, n).astype(np.float32)
    lon = 143000 + rng.uniform(0, 3000, n).astype(np.float32)
    ang = rng.uniform(0, 360, n).astype(np.float32)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(root, "labels_val.csv"), "w") as f:
        f.write("filename,timestamp,latitude,longitude,angle,Region_ID\n")
        for i in range(n):
            name = f"img_{i:04d}.png"   # PNG: lossless, so the torch side
            # can use the in-memory arrays and still see identical pixels
            Image.fromarray(imgs[i]).save(os.path.join(img_dir, name))
            f.write(f"{name},0,{lat[i]},{lon[i]},{ang[i]},1\n")
    return imgs, np.stack([lat, lon], 1), ang


def _norm_torch(imgs_u8):
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _run(assets, legs):
    parity.main(["--assets", str(assets), "--legs", legs])
    with open(os.path.join(str(assets), "parity_report.json")) as f:
        return json.load(f)


class TestEfficientNetSinCosLeg:
    """en_finetuning_gemini.py checkpoint layout at PRODUCTION dimensions
    (the full b0 via the torchvision-layout replica)."""

    def test_leg_passes_against_its_own_torch_metrics(self, tmp_path):
        from test_efficientnet import build_torchvision_style_b0

        imgs, _, ang = _write_assets(str(tmp_path), n=6, size=224)

        feats = build_torchvision_style_b0()
        torch.manual_seed(1)
        classifier = torch.nn.Sequential(
            torch.nn.Dropout(0.3), torch.nn.Linear(1280, 2)).eval()
        sd = {f"backbone.{k}": v for k, v in feats.state_dict().items()}
        sd.update({f"backbone.classifier.{k}": v
                   for k, v in classifier.state_dict().items()})
        ckpt_dir = tmp_path / "efficientnet_sincos"
        ckpt_dir.mkdir()
        torch.save(sd, ckpt_dir / "model_best.pth")

        with torch.no_grad():
            pooled = feats(_norm_torch(imgs)).mean((2, 3))
            cs = classifier(pooled).numpy()
        # [cos, sin] codec (en_finetuning_gemini.py:60,221-228)
        pred = (np.degrees(np.arctan2(cs[:, 1], cs[:, 0])) + 360.0) % 360.0
        d = np.abs(pred - ang) % 360.0
        maae = float(np.minimum(d, 360.0 - d).mean())

        (tmp_path / "parity_config.json").write_text(json.dumps({
            "legs": {"efficientnet_sincos": {
                "golden": {"maae": maae},
                "data_overrides": {"eval_resize_to": None, "batch_size": 4,
                                   "augment": "none"},
            }}}))
        report = _run(tmp_path, "efficientnet_sincos")
        leg = report["legs"]["efficientnet_sincos"]
        assert leg["status"] == "pass", leg
        # converter+eval parity is much tighter than the 2% gate
        assert abs(leg["metrics"]["maae"] - maae) < 0.05 * max(maae, 1.0)

    def test_threshold_violation_fails_and_exits_nonzero(self, tmp_path):
        from test_efficientnet import build_torchvision_style_b0

        _write_assets(str(tmp_path), n=4, size=224)
        feats = build_torchvision_style_b0()
        torch.manual_seed(1)
        classifier = torch.nn.Sequential(
            torch.nn.Dropout(0.3), torch.nn.Linear(1280, 2)).eval()
        sd = {f"backbone.{k}": v for k, v in feats.state_dict().items()}
        sd.update({f"backbone.classifier.{k}": v
                   for k, v in classifier.state_dict().items()})
        ckpt_dir = tmp_path / "efficientnet_sincos"
        ckpt_dir.mkdir()
        torch.save(sd, ckpt_dir / "model_best.pth")
        (tmp_path / "parity_config.json").write_text(json.dumps({
            "legs": {"efficientnet_sincos": {
                "golden": {"maae": 1e-4},   # unreachably good
                "data_overrides": {"eval_resize_to": None, "batch_size": 4,
                                   "augment": "none"},
            }}}))
        with pytest.raises(SystemExit) as ex:
            parity.main(["--assets", str(tmp_path),
                         "--legs", "efficientnet_sincos"])
        assert ex.value.code == 1
        with open(tmp_path / "parity_report.json") as f:
            report = json.load(f)
        assert report["legs"]["efficientnet_sincos"]["status"] == "fail"


class TestSwinGeoposeLeg:
    """swin_attempt_2.py SwinRegressionModel layout (HF SwinModel backbone +
    regressor.{0,3}), against the installed transformers modeling code at a
    tiny config."""

    def test_leg_passes(self, tmp_path, monkeypatch):
        from transformers import SwinConfig, SwinModel

        from geovpr.models.swin import SWIN_VARIANTS

        monkeypatch.setitem(SWIN_VARIANTS, "test-56", dict(
            embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7,
            image_size=56))

        imgs, latlon, _ = _write_assets(str(tmp_path), n=6, size=56)

        torch.manual_seed(2)
        hf = SwinModel(SwinConfig(image_size=56, patch_size=4, embed_dim=32,
                                  depths=[2, 2], num_heads=[2, 4],
                                  window_size=7, drop_path_rate=0.0),
                       add_pooling_layer=True).eval()
        hidden = hf.config.hidden_size   # 64
        regressor = torch.nn.Sequential(
            torch.nn.Linear(hidden, 512), torch.nn.ReLU(),
            torch.nn.Dropout(0.3), torch.nn.Linear(512, 2)).eval()
        sd = {f"backbone.{k}": v for k, v in hf.state_dict().items()}
        sd.update({f"regressor.{k}": v
                   for k, v in regressor.state_dict().items()})
        ckpt_dir = tmp_path / "swin_geopose"
        ckpt_dir.mkdir()
        torch.save({"model_state_dict": sd},   # reference wrapper style
                   ckpt_dir / "model_best.pth")

        mean, scale = latlon.mean(0), latlon.std(0)
        np.savez(ckpt_dir / "latlon_scaler.npz", mean=mean, scale=scale)

        with torch.no_grad():
            pooled = hf(_norm_torch(imgs)).pooler_output
            pred = regressor(pooled).numpy() * scale + mean
        mse = float(((pred - latlon) ** 2).sum() / (2 * len(imgs)))

        (tmp_path / "parity_config.json").write_text(json.dumps({
            "legs": {"swin_geopose": {
                "scaler": "latlon_scaler.npz",
                "golden": {"mse": mse, "rmse": mse ** 0.5},
                "model_overrides": {"variant": "test-56"},
                "data_overrides": {"image_size": 56, "batch_size": 4,
                                   "augment": "none"},
                "convert_overrides": {"depths": [2, 2]},
            }}}))
        report = _run(tmp_path, "swin_geopose")
        leg = report["legs"]["swin_geopose"]
        assert leg["status"] == "pass", leg
        assert abs(leg["metrics"]["mse"] - mse) < 0.01 * mse


class TestDinov2SaladLegs:
    """dinov2salad_finetuning.py DINOv2RegressionModel layout
    (feature_extractor.* hub model + regressor.{0,2}) and the
    descriptor-fidelity leg, both against the torch hub replica."""

    def _hub_replica(self):
        from test_dinov2_convnext_salad import TestSaladHubConverter

        # production SALAD head dims (the head input must be 8448-dim for
        # the dinov2salad_frozen_mlp preset) on a tiny 2-layer backbone
        # IMG=126 -> 9x9 = 81 patch tokens: the SALAD dustbin marginal is
        # log(n_tokens - n_clusters), so the stand-in must keep
        # n_tokens > 64 clusters just like production (256 tokens)
        cls = type("R", (TestSaladHubConverter,),
                   {"D": 64, "NL": 2, "NH": 4, "K": 64, "CD": 128,
                    "TD": 256, "HID": 512, "IMG": 126})
        return cls()._torch_model()

    def _patch_variant(self, monkeypatch):
        from geovpr.models.dinov2 import DINOV2_VARIANTS

        monkeypatch.setitem(DINOV2_VARIANTS, "test-14", dict(
            hidden_size=64, num_layers=2, num_heads=4))

    def test_geopose_leg_passes(self, tmp_path, monkeypatch):
        self._patch_variant(monkeypatch)
        imgs, latlon, _ = _write_assets(str(tmp_path), n=4, size=126)

        hub = self._hub_replica()
        torch.manual_seed(3)
        regressor = torch.nn.Sequential(
            torch.nn.Linear(8448, 512), torch.nn.ReLU(),
            torch.nn.Linear(512, 2)).eval()
        sd = {f"feature_extractor.{k}": v for k, v in hub.state_dict().items()}
        sd.update({f"regressor.{k}": v
                   for k, v in regressor.state_dict().items()})
        ckpt_dir = tmp_path / "dinov2salad_geopose"
        ckpt_dir.mkdir()
        torch.save(sd, ckpt_dir / "model_best.pth")
        mean, scale = latlon.mean(0), latlon.std(0)
        np.savez(ckpt_dir / "latlon_scaler.npz", mean=mean, scale=scale)

        with torch.no_grad():
            desc = hub(_norm_torch(imgs))
            pred = regressor(desc).numpy() * scale + mean
        mse = float(((pred - latlon) ** 2).sum() / (2 * len(imgs)))

        (tmp_path / "parity_config.json").write_text(json.dumps({
            "legs": {"dinov2salad_geopose": {
                "scaler": "latlon_scaler.npz",
                "golden": {"competition_loss": mse},
                "model_overrides": {"variant": "test-14"},
                "data_overrides": {"image_size": 126, "batch_size": 4,
                                   "augment": "none"},
                "convert_overrides": {"depths": 2, "image_size": 126},
            }}}))
        report = _run(tmp_path, "dinov2salad_geopose")
        leg = report["legs"]["dinov2salad_geopose"]
        assert leg["status"] == "pass", leg
        assert abs(leg["metrics"]["competition_loss"] - mse) < 0.01 * mse

    def test_descriptor_leg_passes(self, tmp_path, monkeypatch):
        self._patch_variant(monkeypatch)
        os.makedirs(tmp_path / "salad")
        hub = self._hub_replica()
        torch.save(hub.state_dict(), tmp_path / "salad" / "dino_salad.ckpt")

        rng = np.random.default_rng(4)
        imgs = rng.integers(0, 256, (4, 126, 126, 3), dtype=np.uint8)
        with torch.no_grad():
            want = hub(_norm_torch(imgs)).numpy()
        np.savez(tmp_path / "salad" / "reference_descriptors.npz",
                 images=imgs, descriptors=want)

        (tmp_path / "parity_config.json").write_text(json.dumps({
            "legs": {"salad": {
                "model_overrides": {"variant": "test-14", "num_clusters": 64,
                                    "cluster_dim": 128, "token_dim": 256},
            }}}))
        report = _run(tmp_path, "salad")
        leg = report["legs"]["salad"]
        assert leg["status"] == "pass", leg
        assert leg["metrics"]["descriptor_cosine_min"] > 0.999

    def test_missing_assets_skip_cleanly(self, tmp_path):
        _write_assets(str(tmp_path), n=2, size=56)
        report = _run(tmp_path, "swin_geopose,salad")
        assert all(l["status"] == "skipped"
                   for l in report["legs"].values()), report


def test_sklearn_scaler_pickle_loads():
    """The real assets carry joblib-pickled sklearn StandardScalers
    (swin_attempt_2.py:139) — exercise that exact load path."""
    joblib = pytest.importorskip("joblib")
    sklearn_pre = pytest.importorskip("sklearn.preprocessing")
    import tempfile

    x = np.array([[219000.0, 143000.0], [220000.0, 145000.0],
                  [221000.0, 144000.0]])
    sk = sklearn_pre.StandardScaler().fit(x)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "latlon_scaler.pkl")
        joblib.dump(sk, p)
        st = parity._load_scaler(p)
    np.testing.assert_allclose(np.asarray(st.mean), sk.mean_, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.scale), sk.scale_, rtol=1e-6)

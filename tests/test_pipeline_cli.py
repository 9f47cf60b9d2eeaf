"""Fused-pipeline and CLI-preset tests."""

import csv
import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from geovpr.cli.presets import (
    ANGLE_PRESETS,
    GEOPOSE_PRESETS,
    build_preset,
    objective_for,
)
from geovpr.core.config import AngleConfig, GeoposeConfig
from geovpr.data.pipeline import ArraySource
from geovpr.models.backbone import BackboneOutput
from geovpr.objectives.angle_codec import SinCosCodec
from geovpr.objectives.scaler import fit_scaler
from geovpr.pipeline.fused import FusedPipeline
from geovpr.retrieval import DescriptorIndex


class TinyHeaded(nn.Module):
    out_dim: int = 2

    @nn.compact
    def __call__(self, x, train=False, deterministic=True):
        h = nn.Conv(8, (3, 3), strides=(4, 4))(x)
        return nn.Dense(self.out_dim)(jnp.mean(h, axis=(1, 2)))


class TinyDescriptor(nn.Module):
    dim: int = 32

    @nn.compact
    def __call__(self, x, train=False, deterministic=True):
        h = nn.Conv(8, (3, 3), strides=(4, 4))(x)
        pooled = nn.Dense(self.dim)(jnp.mean(h, axis=(1, 2)))
        pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return BackboneOutput(pooled=pooled, tokens=None)


class TestPresets:
    @pytest.mark.parametrize("name", sorted([*GEOPOSE_PRESETS, *ANGLE_PRESETS]))
    def test_buildable_and_typed(self, name):
        cfg = build_preset(name)
        assert isinstance(cfg, (GeoposeConfig, AngleConfig))
        obj = objective_for(cfg)
        assert hasattr(obj, "loss") and hasattr(obj, "monitor")

    @pytest.mark.parametrize("name", sorted([*GEOPOSE_PRESETS, *ANGLE_PRESETS]))
    def test_model_builds(self, name):
        # Regression guard for round-1's unbuildable dinov2salad_frozen_mlp
        # preset (default variant leaked into a family that rejects it):
        # construct each preset's full RegressionModel exactly as cli/train
        # does, and abstractly init it (jax.eval_shape traces setup() and the
        # whole forward without running any compute, so even Swin-B-384 is
        # cheap on CPU).
        import dataclasses as dc
        from geovpr.train.model import RegressionModel

        cfg = build_preset(name)
        model = RegressionModel(config=dc.replace(
            cfg.model, image_size=cfg.data.image_size))
        x = jnp.zeros((1, cfg.data.image_size, cfg.data.image_size, 3),
                      jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        assert "params" in shapes
        out = jax.eval_shape(
            lambda v: model.apply(v, x, train=False, deterministic=True),
            shapes)
        assert out.shape == (1, cfg.model.out_dim)

    def test_unknown_preset(self):
        with pytest.raises(ValueError):
            build_preset("nope")

    def test_codec_orders_match_reference_families(self):
        # EfficientNet family stores [cos, sin]; Swin/DINOv2 [sin, cos]
        # (SURVEY.md §3.4 trap)
        assert build_preset("efficientnet_sincos_gemini").codec_order == "cos_sin"
        assert build_preset("swin_t224_sincos_gemini").codec_order == "sin_cos"
        assert build_preset("dinov2_sincos_gemini").codec_order == "sin_cos"

    def test_gemini2_hparams_cited(self):
        cfg = build_preset("swin_b384_gemini2")
        assert cfg.loss == "huber" and cfg.huber_delta == 1.0
        assert cfg.optim.lr == 5e-5 and cfg.optim.weight_decay == 0.01
        assert cfg.optim.plateau_factor == 0.2 and cfg.optim.plateau_patience == 5
        assert cfg.model.variant == "base-384"


class TestFusedPipeline:
    def _make(self, n=20, with_index=True):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
        src = ArraySource(images=imgs,
                          targets=np.zeros((n, 2), np.float32),
                          filenames=[f"img_{i:04d}.jpg" for i in range(n)])
        key = jax.random.PRNGKey(0)
        geo = TinyHeaded(out_dim=2)
        geo_v = geo.init(key, jnp.zeros((1, 32, 32, 3)))
        ang = TinyHeaded(out_dim=2)
        ang_v = ang.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
        desc = TinyDescriptor()
        desc_v = desc.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
        scaler = fit_scaler(jnp.array(
            rng.normal([219000, 143000], [500, 700], (50, 2)).astype(np.float32)))

        index = None
        if with_index:
            db = rng.normal(size=(37, 32)).astype(np.float32)
            db /= np.linalg.norm(db, axis=1, keepdims=True)
            index = DescriptorIndex(dim=32, dtype=jnp.float32).build(db)

        pipe = FusedPipeline(
            geopose_model=geo, geopose_variables=geo_v, geopose_scaler=scaler,
            angle_model=ang, angle_variables=ang_v,
            angle_codec=SinCosCodec("cos_sin"),
            descriptor_model=desc, descriptor_variables=desc_v,
            index=index, top_k=3, batch_size=8)
        return pipe, src

    def test_run_produces_all_outputs(self):
        pipe, src = self._make()
        out = pipe.run(src)
        n = len(src)
        assert out["latlon"].shape == (n, 2)
        assert out["angle"].shape == (n,)
        assert (out["angle"] >= 0).all() and (out["angle"] < 360).all()
        assert out["descriptor"].shape == (n, 32)
        assert out["retrieval_indices"].shape == (n, 3)
        assert (out["retrieval_indices"] < 37).all()
        # geopose predictions live in the scaler's original coordinate range
        assert 210000 < out["latlon"][:, 0].mean() < 230000

    def test_export_writes_sorted_csvs(self, tmp_path):
        pipe, src = self._make(with_index=False)
        written = pipe.export(src, str(tmp_path))
        with open(written["geopose"], newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == len(src)
        names = [r["filename"] for r in rows]
        assert names == sorted(names)
        with open(written["angle"], newline="") as f:
            header = next(csv.reader(f))
        assert header == ["filename", "predicted_angle_degrees"]

    def test_partial_pipeline(self):
        pipe, src = self._make(with_index=False)
        pipe.descriptor_model = None
        pipe.angle_model = None
        pipe._step = jax.jit(pipe._forward)
        out = pipe.run(src)
        assert set(out.keys()) == {"latlon"}


class TestRetrieveCli:
    def _write_dataset(self, root, n_gallery=10, n_query=3):
        from PIL import Image
        rng = np.random.default_rng(0)
        img_dir = os.path.join(root, "images")
        os.makedirs(img_dir, exist_ok=True)

        def write_rows(path, names, lats, lons):
            with open(path, "w") as f:
                f.write("filename,timestamp,latitude,longitude,angle,Region_ID\n")
                for nm, la, lo in zip(names, lats, lons):
                    f.write(f"{nm},0,{la},{lo},90.0,1\n")

        def make(count, prefix):
            names, lats, lons = [], [], []
            for i in range(count):
                nm = f"{prefix}_{i:03d}.jpg"
                arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(img_dir, nm))
                names.append(nm)
                lats.append(219000.0 + i * 10.0)
                lons.append(143000.0 + i * 10.0)
            return names, lats, lons

        g = make(n_gallery, "g")
        q = make(n_query, "q")
        write_rows(os.path.join(root, "gallery.csv"), *g)
        write_rows(os.path.join(root, "query.csv"), *q)
        return img_dir

    def test_end_to_end(self, tmp_path, capsys):
        import json
        from geovpr.cli.retrieve import main

        root = str(tmp_path)
        img_dir = self._write_dataset(root)
        main(["--gallery-csv", os.path.join(root, "gallery.csv"),
              "--query-csv", os.path.join(root, "query.csv"),
              "--image-root", img_dir,
              "--out-dir", os.path.join(root, "out"),
              "--variant", "small-14", "--image-size", "28",
              "--batch-size", "4", "--top-k", "3"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["gallery_size"] == 10 and out["num_queries"] == 3
        assert 0.0 <= out["recall@1"] <= 1.0
        with open(out["matches_csv"], newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3 * 3
        assert set(r["query_filename"] for r in rows) == {
            "q_000.jpg", "q_001.jpg", "q_002.jpg"}


    def test_save_then_load_index(self, tmp_path, capsys):
        """Build-once/serve-many: --save-index persists the gallery index +
        metadata; a second run with --load-index (no gallery CSV at all)
        reproduces the exact same matches CSV."""
        import json
        from geovpr.cli.retrieve import main

        root = str(tmp_path)
        img_dir = self._write_dataset(root, n_gallery=8, n_query=2)
        idx_path = os.path.join(root, "gallery_index.npz")
        common = ["--query-csv", os.path.join(root, "query.csv"),
                  "--image-root", img_dir,
                  "--variant", "small-14", "--image-size", "28",
                  "--batch-size", "4", "--top-k", "3"]
        main(["--gallery-csv", os.path.join(root, "gallery.csv"),
              "--out-dir", os.path.join(root, "out1"),
              "--save-index", idx_path] + common)
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["saved_index"] == idx_path

        main(["--load-index", idx_path,
              "--out-dir", os.path.join(root, "out2")] + common)
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["gallery_size"] == 8
        assert out2["recall@1"] == out1["recall@1"]
        with open(out1["matches_csv"]) as f1, open(out2["matches_csv"]) as f2:
            assert f1.read() == f2.read()

    def test_end_to_end_int8(self, tmp_path, capsys):
        """--int8 serving path: calibrates on the first gallery batch and
        produces the same shaped outputs (fidelity itself is covered by
        tests/test_quant.py)."""
        import json
        from geovpr.cli.retrieve import main

        root = str(tmp_path)
        img_dir = self._write_dataset(root, n_gallery=6, n_query=2)
        main(["--gallery-csv", os.path.join(root, "gallery.csv"),
              "--query-csv", os.path.join(root, "query.csv"),
              "--image-root", img_dir,
              "--out-dir", os.path.join(root, "out"),
              "--variant", "small-14", "--image-size", "28",
              "--batch-size", "4", "--top-k", "2", "--int8"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["gallery_size"] == 6 and out["num_queries"] == 2


class TestFuseCli:
    def test_requires_a_head(self, tmp_path):
        from geovpr.cli.fuse import main
        with pytest.raises(SystemExit):
            main(["--test-dir", str(tmp_path)])


class TestRecallRadius:
    def test_proximity_recall(self):
        from geovpr.retrieval.index import recall_at_k_radius
        gallery = jnp.array([[0.0, 0.0], [100.0, 0.0], [200.0, 0.0]])
        queries = jnp.array([[5.0, 0.0], [195.0, 0.0]])
        # q0's true nbr is g0 (5m), q1's is g2 (5m)
        retrieved = jnp.array([[1, 0], [0, 1]])  # ranks: q0 ->(g1,g0), q1 ->(g0,g1)
        assert float(recall_at_k_radius(retrieved, queries, gallery, 25.0, 1)) == 0.0
        assert float(recall_at_k_radius(retrieved, queries, gallery, 25.0, 2)) == 0.5
        retrieved = jnp.array([[0, 1], [2, 0]])
        assert float(recall_at_k_radius(retrieved, queries, gallery, 25.0, 1)) == 1.0


class TestEvaluateCliSubmission:
    def test_submission_csv_id_parse_and_numeric_sort(self, tmp_path,
                                                      monkeypatch, capsys):
        """--submission-csv wiring: preds.csv with ID parsed from filename
        digits and rows sorted numerically (swin_validation.py:121-134) —
        img_10 must sort AFTER img_2."""
        import json
        from PIL import Image
        import geovpr.cli.common as cli_common
        from geovpr.cli.evaluate import main
        from geovpr.core.config import (
            DataConfig, GeoposeConfig, OptimConfig, TrainConfig)
        from geovpr.objectives.scaler import fit_scaler
        from geovpr.objectives.workloads import GeoposeObjective
        from geovpr.parallel import create_mesh
        from geovpr.train import Trainer
        from tests.test_train import TinyModel

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        names = ["img_10.jpg", "img_2.jpg", "img_7.jpg"]
        with open(tmp_path / "val.csv", "w") as f:
            f.write("filename,timestamp,latitude,longitude,angle,Region_ID\n")
            for i, nm in enumerate(names):
                Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                             dtype=np.uint8)).save(img_dir / nm)
                f.write(f"{nm},0,{219000 + i},{143000 + i},0.0,1\n")

        scaler = fit_scaler(jnp.array(
            rng.normal([219000, 143000], [500, 700], (50, 2)).astype(np.float32)))
        tr = Trainer(model=TinyModel(out_dim=2),
                     objective=GeoposeObjective(loss_name="mse"),
                     optim_cfg=OptimConfig(), train_cfg=TrainConfig(
                         save_dir=str(tmp_path / "runs")),
                     data_cfg=DataConfig(image_size=32, batch_size=4),
                     mesh=create_mesh(), scaler=scaler)
        tr.init_state((32, 32, 3))
        monkeypatch.setattr(cli_common, "load_trained",
                            lambda *a, **k: (tr, GeoposeConfig()))

        main(["--preset", "swin_b384_gemini2", "--run-dir", str(tmp_path),
              "--val-csv", str(tmp_path / "val.csv"),
              "--image-root", str(img_dir),
              "--submission-csv", "preds.csv"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with open(out["submission_csv"], newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["ID", "latitude", "longitude"]
        assert [r[0] for r in rows[1:]] == ["2", "7", "10"]


class TestFusedPerHeadResize:
    def test_heads_at_different_resolutions_share_one_stream(self):
        """The fused contract: ONE decoded stream at the max resolution,
        each head resized on device (geopose 384-style vs angle
        Resize+CenterCrop vs descriptor 224-style, scaled down here)."""
        rng = np.random.default_rng(0)
        n = 10
        src = ArraySource(
            images=rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
            targets=np.zeros((n, 2), np.float32),
            filenames=[f"img_{i:04d}.jpg" for i in range(n)])
        scaler = fit_scaler(jnp.array(
            rng.normal([219000, 143000], [500, 700], (50, 2)).astype(np.float32)))
        geo = TinyHeaded(out_dim=2)
        ang = TinyHeaded(out_dim=2)
        desc = TinyDescriptor()
        pipe = FusedPipeline(
            geopose_model=geo,
            geopose_variables=geo.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 16, 16, 3))),
            geopose_scaler=scaler, geopose_size=16,
            angle_model=ang,
            angle_variables=ang.init(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 20, 20, 3))),
            angle_codec=SinCosCodec("cos_sin"),
            angle_size=20, angle_resize_to=28,
            descriptor_model=desc,
            descriptor_variables=desc.init(jax.random.PRNGKey(2),
                                           jnp.zeros((1, 32, 32, 3))),
            descriptor_size=32, batch_size=4)
        out = pipe.run(src)
        assert out["latlon"].shape == (n, 2)
        assert out["angle"].shape == (n,)
        assert out["descriptor"].shape == (n, 32)

    def test_resize_for_head_center_crop(self):
        x = jnp.arange(1 * 8 * 8 * 1, dtype=jnp.float32).reshape(1, 8, 8, 1)
        y = FusedPipeline._resize_for_head(x, size=4, resize_to=8)
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(x[:, 2:6, 2:6, :]))
        z = FusedPipeline._resize_for_head(x, size=8)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(x))

    def test_resize_for_head_matches_jax_image_resize(self):
        """The separable-matmul resize (weights = jax.image.resize of the
        identity) must reproduce jax.image.resize itself, plain and with
        the crop folded into the weight slice."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)).astype(np.float32))
        want = jax.image.resize(x, (2, 28, 28, 3), "bilinear")
        got = FusedPipeline._resize_for_head(x, size=28)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        big = jax.image.resize(x, (2, 32, 32, 3), "bilinear")
        want2 = big[:, 2:30, 2:30, :]
        got2 = FusedPipeline._resize_for_head(x, size=28, resize_to=32)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-5, atol=1e-5)
        # upscale path too (antialias off in jax.image for upscales;
        # weights extracted from resize itself so parity is automatic)
        up = jax.image.resize(x, (2, 56, 56, 3), "bilinear")
        got3 = FusedPipeline._resize_for_head(x, size=56)
        np.testing.assert_allclose(np.asarray(got3), np.asarray(up),
                                   rtol=1e-5, atol=1e-5)


class TestFusedRetrievalExport:
    def test_export_writes_retrieval_matches(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 8
        src = ArraySource(
            images=rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
            targets=np.zeros((n, 2), np.float32),
            filenames=[f"img_{i:04d}.jpg" for i in range(n)])
        desc = TinyDescriptor()
        db = rng.normal(size=(13, 32)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        pipe = FusedPipeline(
            descriptor_model=desc,
            descriptor_variables=desc.init(jax.random.PRNGKey(2),
                                           jnp.zeros((1, 32, 32, 3))),
            index=DescriptorIndex(dim=32, dtype=jnp.float32).build(db),
            gallery_filenames=[f"g_{i:03d}.jpg" for i in range(13)],
            top_k=3, batch_size=4)
        written = pipe.export(src, str(tmp_path))
        assert "retrieval" in written
        with open(written["retrieval"], newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == n * 3
        assert rows[0]["query_filename"] == "img_0000.jpg"
        assert rows[0]["rank"] == "1"
        assert rows[0]["match_filename"].startswith("g_")
        # ranks are score-descending per query
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_filename"], []).append(float(r["score"]))
        for scores in by_q.values():
            assert scores == sorted(scores, reverse=True)


class TestFuseCliRetrieval:
    def test_retrieval_only_fuse_end_to_end(self, tmp_path, capsys):
        import json
        from geovpr.cli.fuse import main

        root = str(tmp_path)
        img_dir = TestRetrieveCli()._write_dataset(root, n_gallery=6,
                                                   n_query=0)
        # unlabeled test images = the fused query stream
        test_dir = os.path.join(root, "test")
        os.makedirs(test_dir)
        from PIL import Image
        rng = np.random.default_rng(3)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3))
                            .astype(np.uint8)).save(
                os.path.join(test_dir, f"t_{i:02d}.jpg"))

        main(["--test-dir", test_dir,
              "--gallery-csv", os.path.join(root, "gallery.csv"),
              "--image-root", img_dir,
              "--salad-variant", "small-14", "--salad-image-size", "28",
              "--top-k", "2", "--batch-size", "4",
              "--out-dir", os.path.join(root, "out")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with open(out["retrieval_csv"], newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 4 * 2
        assert set(r["query_filename"] for r in rows) == {
            f"t_{i:02d}.jpg" for i in range(4)}

    def test_fuse_approx_matches_exact(self, tmp_path, capsys):
        """--approx (the serving-index top-k mode) through the fuse CLI:
        identical retrieval CSV to the exact run (CPU lowers approx_max_k
        exactly; the on-chip +10.7% fused throughput is measured in
        benches/FUSE_APPROX_r05.log)."""
        import json
        from geovpr.cli.fuse import main

        root = str(tmp_path)
        img_dir = TestRetrieveCli()._write_dataset(root, n_gallery=6,
                                                   n_query=0)
        test_dir = os.path.join(root, "test")
        os.makedirs(test_dir)
        from PIL import Image
        rng = np.random.default_rng(3)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3))
                            .astype(np.uint8)).save(
                os.path.join(test_dir, f"t_{i:02d}.jpg"))
        common = ["--test-dir", test_dir,
                  "--gallery-csv", os.path.join(root, "gallery.csv"),
                  "--image-root", img_dir,
                  "--salad-variant", "small-14", "--salad-image-size", "28",
                  "--top-k", "2", "--batch-size", "4"]
        main(common + ["--out-dir", os.path.join(root, "exact")])
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        main(common + ["--approx", "0.99",
                       "--out-dir", os.path.join(root, "approx")])
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with open(out1["retrieval_csv"]) as f1, \
                open(out2["retrieval_csv"]) as f2:
            assert f1.read() == f2.read()

    def test_retrieval_fuse_save_then_load_index(self, tmp_path, capsys):
        """Fuse with --save-index, then again with --load-index (no gallery
        CSV): identical retrieval CSV, no gallery re-extraction."""
        import json
        from geovpr.cli.fuse import main

        root = str(tmp_path)
        img_dir = TestRetrieveCli()._write_dataset(root, n_gallery=6,
                                                   n_query=0)
        test_dir = os.path.join(root, "test")
        os.makedirs(test_dir)
        from PIL import Image
        rng = np.random.default_rng(3)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3))
                            .astype(np.uint8)).save(
                os.path.join(test_dir, f"t_{i:02d}.jpg"))
        idx_path = os.path.join(root, "gallery_index.npz")
        common = ["--test-dir", test_dir,
                  "--salad-variant", "small-14", "--salad-image-size", "28",
                  "--top-k", "2", "--batch-size", "4"]
        main(common + ["--gallery-csv", os.path.join(root, "gallery.csv"),
                       "--image-root", img_dir,
                       "--save-index", idx_path,
                       "--out-dir", os.path.join(root, "out1")])
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        main(common + ["--load-index", idx_path,
                       "--out-dir", os.path.join(root, "out2")])
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with open(out1["retrieval_csv"]) as f1, \
                open(out2["retrieval_csv"]) as f2:
            assert f1.read() == f2.read()

    def test_retrieval_only_fuse_int8(self, tmp_path, capsys):
        """--int8 on the fused retrieval component: calibrate on the first
        gallery batch, quantized gallery+query descriptors end-to-end."""
        import json
        from geovpr.cli.fuse import main

        root = str(tmp_path)
        img_dir = TestRetrieveCli()._write_dataset(root, n_gallery=6,
                                                   n_query=0)
        test_dir = os.path.join(root, "test")
        os.makedirs(test_dir)
        from PIL import Image
        rng = np.random.default_rng(3)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3))
                            .astype(np.uint8)).save(
                os.path.join(test_dir, f"t_{i:02d}.jpg"))

        main(["--test-dir", test_dir,
              "--gallery-csv", os.path.join(root, "gallery.csv"),
              "--image-root", img_dir,
              "--salad-variant", "small-14", "--salad-image-size", "28",
              "--top-k", "2", "--batch-size", "4", "--int8",
              "--out-dir", os.path.join(root, "out")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with open(out["retrieval_csv"], newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3 * 2


class TestRetrieveApproxFlag:
    def test_approx_matches_exact_on_separated_gallery(self, tmp_path,
                                                       capsys):
        """--approx (lax.approx_max_k serving mode) through the retrieve
        CLI: on a small, well-separated gallery the matches CSV must equal
        the exact run's (CPU lowers approx_max_k exactly; the on-chip
        recall/throughput tradeoff is measured in
        benches/RETRIEVAL_OPT_r05.log)."""
        import json
        from geovpr.cli.retrieve import main

        root = str(tmp_path)
        img_dir = TestRetrieveCli._write_dataset(
            TestRetrieveCli(), root, n_gallery=8, n_query=2)
        common = ["--gallery-csv", os.path.join(root, "gallery.csv"),
                  "--query-csv", os.path.join(root, "query.csv"),
                  "--image-root", img_dir,
                  "--variant", "small-14", "--image-size", "28",
                  "--batch-size", "4", "--top-k", "3"]
        main(common + ["--out-dir", os.path.join(root, "exact")])
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        main(common + ["--out-dir", os.path.join(root, "approx"),
                       "--approx", "0.99"])
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["recall@1"] == out1["recall@1"]
        with open(out1["matches_csv"]) as f1, open(out2["matches_csv"]) as f2:
            assert f1.read() == f2.read()

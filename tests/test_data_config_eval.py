"""Tests for the data layer, config system, and evaluation metrics."""

import numpy as np
import pytest

import jax.numpy as jnp


class TestNormalize:
    def test_matches_reference_semantics(self, rng):
        """Golden test vs a direct transliteration of utils.py:155-191."""
        from mmtpu.data.normalize import normalize_split

        n, L, A, V = 8, 6, 5, 4
        cov = rng.standard_normal((n, L, A)).astype(np.float32) * 3
        fac = rng.standard_normal((n, L, V)).astype(np.float32) * 2
        cov[:, 4:] = 0.0  # padding frames
        fac[:, 5:] = 0.0
        cov[:, :, 2] = 7.0  # constant audio feature → dropped

        got_c, got_f, got_m = normalize_split(cov.copy(), fac.copy(), parity=True)

        # oracle
        t = {"covarep": cov.copy(), "facet": fac.copy()}
        amin, amax = t["covarep"].min((0, 1)), t["covarep"].max((0, 1))
        nz = (amax - amin).nonzero()[0]
        t["covarep"] = t["covarep"][:, :, nz]
        apad = t["covarep"] == 0
        vpad = t["facet"] == 0
        amask = (t["covarep"] != 0).astype(int)
        vmask = (t["facet"] != 0).astype(int)
        amin, amax = t["covarep"].min((0, 1)), t["covarep"].max((0, 1))
        vmin, vmax = t["facet"].min((0, 1)), t["facet"].max((0, 1))
        t["covarep"] = (t["covarep"] + amin) * 2.0 / (amax - amin) - 1.0
        t["facet"] = (t["facet"] + vmin) * 2.0 / (vmax - vmin) - 1.0
        t["covarep"][apad] = -10.0
        t["facet"][vpad] = -10.0

        assert got_c.shape[-1] == A - 1  # constant feature dropped
        np.testing.assert_allclose(got_c, t["covarep"], rtol=1e-5)
        np.testing.assert_allclose(got_f, t["facet"], rtol=1e-5)
        np.testing.assert_array_equal(got_m["covarep"], amask)
        np.testing.assert_array_equal(got_m["facet"], vmask)

    def test_correct_mode_range(self, rng):
        from mmtpu.data.normalize import normalize_split

        cov = rng.random((5, 4, 3)).astype(np.float32) + 0.5
        fac = rng.random((5, 4, 3)).astype(np.float32) + 0.5
        got_c, got_f, _ = normalize_split(cov, fac, parity=False)
        assert got_c.min() >= -1.0 - 1e-5 and got_c.max() <= 1.0 + 1e-5


class TestConfig:
    def test_grid_parity(self):
        """512 configs; same axes/values as configs/make_configs.py:16-32."""
        from mmtpu.config import GRID_PARAMS, make_grid

        grid = make_grid()
        assert len(grid) == 512
        nums = sorted(c["config_num"] for c in grid)
        assert nums == list(range(512))
        import itertools

        combos = {
            tuple(c[k] for k in GRID_PARAMS) for c in grid
        }
        expected = set(itertools.product(*GRID_PARAMS.values()))
        assert combos == expected

    def test_from_dict_merge_semantics(self):
        from mmtpu.config import ExperimentConfig

        cfg = ExperimentConfig.from_dict(
            {"lr": 5e-4, "e2e": "n", "config_num": 7, "sentiment_epochs": 11},
            pos_embed_dim=4,
        )
        assert cfg.lr == 5e-4
        assert cfg.e2e is False
        assert cfg.pos_embed_dim == 4
        assert cfg.n_sentiment_epochs == 11
        assert cfg.config_num == 7

    def test_json_roundtrip(self, tmp_path):
        from mmtpu.config import ExperimentConfig

        cfg = ExperimentConfig(lr=3e-4, norm="layer_norm", config_num=3)
        p = str(tmp_path / "c.json")
        cfg.to_json(p)
        back = ExperimentConfig.from_json(p)
        assert back == cfg


class TestSynthetic:
    @pytest.mark.parametrize("name", ["mosi", "pom", "iemocap"])
    def test_shapes(self, name):
        from mmtpu.data.synthetic import synthesize_dataset

        ds = synthesize_dataset(name, n_train=20, n_valid=6, n_test=8,
                                vocab_size=50, embed_dim=16, audio_dim=5,
                                visual_dim=4)
        tr = ds["splits"]["train"]
        assert ds["word_embeddings"].shape == (50, 16)
        assert tr["covarep"].shape == (20, 20, 5)
        if name == "mosi":
            assert tr["text"].dtype == np.int64
            assert tr["label"].shape == (20,)
        elif name == "pom":
            assert tr["text"].shape == (20, 20, 16)
            assert tr["label"].shape == (20, 17)
        else:
            assert tr["label"].shape[1] == 2

    @pytest.mark.parametrize("name", ["mosi", "pom"])
    def test_prepare_device_data(self, name):
        from mmtpu.data.pipeline import prepare_device_data
        from mmtpu.data.synthetic import synthesize_dataset

        ds = synthesize_dataset(name, n_train=12, n_valid=5, n_test=6,
                                vocab_size=40, embed_dim=8, audio_dim=5,
                                visual_dim=4)
        prep = prepare_device_data(ds, pos_embed_dim=2, pos_mode="baked")
        tr = prep.splits["train"]
        assert prep.audio_dim == tr["audio"].shape[-1]
        assert tr["audio"].shape[-1] == tr["audio_mask"].shape[-1]
        assert prep.sif_init["train"].shape == (12, 8)
        assert np.isfinite(np.asarray(prep.sif_init["train"])).all()
        # baked pos channels have mask 1
        assert np.asarray(tr["audio_mask"])[:, :, -2:].min() == 1.0
        if name == "pom":
            assert tr["text_gauss"].shape[-1] == 8
            assert tr["text_gauss_mask"].ndim == 2

    def test_prepare_shared_pos_mode(self):
        from mmtpu.data.pipeline import prepare_device_data
        from mmtpu.data.synthetic import synthesize_dataset

        ds = synthesize_dataset("mosi", n_train=10, n_valid=4, n_test=4,
                                vocab_size=30, embed_dim=8, audio_dim=5,
                                visual_dim=4)
        prep = prepare_device_data(ds, pos_embed_dim=2, pos_mode="shared",
                                   pos_max_dim=4)
        tr = prep.splits["train"]
        assert tr["audio"].shape[-1] == 5  # base features only
        assert prep.pos_table.shape == (20, 4)
        assert "pos_mask" in tr

    def test_numpy_twins_match_jax_ops(self, rng):
        """pipeline's numpy helpers == the jittable mmtpu.ops versions."""
        from mmtpu.data import pipeline as pl
        from mmtpu import ops

        ids = rng.integers(-1, 30, size=(9, 7))
        vw = rng.random(30).astype(np.float32)
        we = rng.standard_normal((30, 6)).astype(np.float32)
        np.testing.assert_allclose(
            pl._np_seq_weights(ids, vw),
            np.asarray(ops.seq_weights(jnp.asarray(ids), jnp.asarray(vw))),
            rtol=1e-6,
        )
        w = pl._np_seq_weights(ids, vw)
        np.testing.assert_allclose(
            pl._np_sif_embedding(we, ids, w),
            np.asarray(ops.sif_embedding(jnp.asarray(we), jnp.asarray(ids), jnp.asarray(w))),
            rtol=0, atol=1e-4,
        )
        np.testing.assert_allclose(
            pl._np_positional_encoding(11, 4),
            np.asarray(ops.positional_encoding(11, 4)),
            rtol=1e-6, atol=1e-6,
        )
        data = rng.standard_normal((6, 11, 3)).astype(np.float32)
        for bug in (False, True):
            np.testing.assert_allclose(
                pl._np_add_positional(data, 4, bug),
                np.asarray(
                    ops.add_positional_embeddings(jnp.asarray(data), 4, bug_parity=bug)
                ),
                rtol=1e-6, atol=1e-6,
            )

    def test_registry_fallback(self):
        from mmtpu.data.registry import load_dataset

        ds = load_dataset("mosi", data_dir="/nonexistent")
        assert ds["synthetic"] is True
        with pytest.raises(Exception):
            load_dataset("mosi", data_dir="/nonexistent", require_real=True)


class TestMetrics:
    def test_mosi_metrics_vs_sklearn(self, rng):
        from sklearn.metrics import accuracy_score, f1_score
        from mmtpu.eval.metrics import mosi_metrics

        pred = (rng.standard_normal(200) * 1.5).astype(np.float32)
        y = np.clip(rng.standard_normal(200) * 1.5, -3, 3).astype(np.float32)
        got = {k: float(v) for k, v in mosi_metrics(jnp.asarray(pred), jnp.asarray(y)).items()}

        assert abs(got["mae"] - np.mean(np.abs(pred - y))) < 1e-5
        assert abs(got["corr"] - np.corrcoef(pred, y)[0][1]) < 1e-5
        want_mult = np.sum(np.round(pred) == np.round(y)) / len(y)
        assert abs(got["mult_acc"] - want_mult) < 1e-6
        want_f1 = f1_score(np.round(pred), np.round(y), average="weighted")
        assert abs(got["f_score"] - want_f1) < 1e-6
        want_acc = accuracy_score(y >= 0, pred >= 0)
        assert abs(got["accuracy"] - want_acc) < 1e-6

    def test_iemocap_metrics_vs_sklearn(self, rng):
        from sklearn.metrics import accuracy_score, f1_score
        from mmtpu.eval.metrics import iemocap_metrics

        pred = rng.standard_normal((100, 4)).astype(np.float32)
        y = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 100)]
        got = {k: float(v) for k, v in iemocap_metrics(jnp.asarray(pred), jnp.asarray(y)).items()}
        t, p = np.argmax(y, 1), np.argmax(pred, 1)
        assert abs(got["accuracy"] - accuracy_score(t, p)) < 1e-6
        assert abs(got["f_score"] - f1_score(t, p, average="weighted")) < 1e-6

    def test_report_full_loss_vs_sklearn(self, rng):
        from sklearn.metrics import classification_report, confusion_matrix as sk_cm
        from mmtpu.eval.report import full_loss

        pred = (rng.standard_normal(150) * 1.5).astype(np.float64)
        y = np.clip(rng.standard_normal(150) * 1.5, -3, 3).astype(np.float64)
        got = full_loss(pred, y, verbose=False)
        want_cm = sk_cm(y >= 0, pred >= 0)
        np.testing.assert_array_equal(np.asarray(got["confusion_matrix"]), want_cm)
        want_rep = classification_report(y >= 0, pred >= 0, digits=5, output_dict=True)
        for k in ("macro avg", "weighted avg"):
            for metric in ("precision", "recall", "f1-score"):
                assert abs(got["class_report"][k][metric] - want_rep[k][metric]) < 1e-9
        assert abs(got["class_report"]["accuracy"] - want_rep["accuracy"]) < 1e-9

    def test_pom_metrics_shapes(self, rng):
        from mmtpu.eval.metrics import pom_metrics

        pred = rng.standard_normal((50, 17)).astype(np.float32) + 4
        y = rng.standard_normal((50, 17)).astype(np.float32) + 4
        got = pom_metrics(jnp.asarray(pred), jnp.asarray(y))
        for k in ("mae", "corr", "mult_acc", "f_score"):
            assert got[k].shape == (17,)

    def test_pom_report_vs_sklearn(self, rng):
        from sklearn.metrics import f1_score
        from mmtpu.eval.report import pom_loss

        pred = (rng.standard_normal((40, 3)) + 4).astype(np.float64)
        y = (rng.standard_normal((40, 3)) + 4).astype(np.float64)
        got = pom_loss(pred, y, verbose=False)
        for i in range(3):
            want = round(
                float(f1_score(np.round(pred[:, i]), np.round(y[:, i]),
                               average="weighted")), 5)
            assert abs(got["f_score"][i] - want) < 1e-6


class TestRealDataLoaders:
    """Exercise the real-file ingestion paths with fixture files written in
    the reference's exact layout (utils.py:20-128, sif.py:34-76)."""

    def _write_mosi(self, root, rng):
        import h5py
        import pickle

        (root / "mosi").mkdir(parents=True)
        (root / "data").mkdir()
        word2ix = {f"w{i}": i for i in range(40)}
        pickle.dump(word2ix, open(root / "mosi/word2ix_300_mosi.pkl", "wb"))
        np.save(root / "mosi/glove_300_mosi.npy",
                rng.standard_normal((40, 8)).astype(np.float32))
        np.save(root / "word_weights.npy", rng.random(40).astype(np.float32))
        with h5py.File(root / "data/mosi_data.h5", "w") as f:
            for split, n in (("train", 6), ("valid", 3), ("test", 4)):
                g = f.create_group(split)
                g["facet"] = rng.standard_normal((n, 5, 4)).astype(np.float32)
                g["covarep"] = rng.standard_normal((n, 5, 3)).astype(np.float32)
                g["text"] = rng.integers(0, 40, (n, 5)).astype(np.int64)
                g["lengths"] = np.full(n, 5, np.int64)
                g["label"] = rng.standard_normal(n).astype(np.float32)
                g["id"] = np.arange(n, dtype=np.int64)

    def test_load_mosi_real(self, tmp_path, rng):
        from mmtpu.data.registry import load_dataset

        self._write_mosi(tmp_path, rng)
        ds = load_dataset("mosi", data_dir=str(tmp_path), require_real=True)
        assert ds["synthetic"] is False
        assert ds["word_embeddings"].shape == (40, 8)
        assert ds["splits"]["train"]["text"].shape == (6, 5)
        assert "w3" in ds["word2ix"]
        # it must flow through prepare + a fit
        from mmtpu.data.pipeline import prepare_device_data

        prep = prepare_device_data(ds, pos_embed_dim=2, pos_mode="baked")
        assert prep.sif_init["train"].shape == (6, 8)

    def test_load_pom_real(self, tmp_path, rng):
        import h5py
        import json as _json

        from mmtpu.data.registry import load_dataset

        (tmp_path / "pom").mkdir(parents=True)
        (tmp_path / "data").mkdir()
        _json.dump({f"w{i}": i for i in range(30)},
                   open(tmp_path / "pom/glove_mappings.pom.json", "w"))
        np.save(tmp_path / "pom/glove.pom.npy",
                rng.standard_normal((30, 6)).astype(np.float32))
        np.save(tmp_path / "pom/pom_word_weights.npy",
                rng.random(30).astype(np.float32))
        with h5py.File(tmp_path / "data/pom_data.h5", "w") as f:
            for split, n in (("train", 5), ("valid", 2), ("test", 3)):
                g = f.create_group(split)
                g["facet"] = rng.standard_normal((n, 4, 3)).astype(np.float32)
                g["covarep"] = rng.standard_normal((n, 4, 2)).astype(np.float32)
                g["text"] = rng.standard_normal((n, 4, 6)).astype(np.float32)
                g["label"] = rng.standard_normal((n, 17)).astype(np.float32)
        for split, n in (("train", 5), ("valid", 2), ("test", 3)):
            np.save(tmp_path / f"pom/pom_{split}_ids.npy",
                    rng.integers(0, 30, (n, 9)).astype(np.int64))
        ds = load_dataset("pom", data_dir=str(tmp_path), require_real=True)
        assert ds["synthetic"] is False
        assert ds["splits"]["test"]["text_id"].shape == (3, 9)

    def test_word_weights_from_freq_file(self, tmp_path):
        from mmtpu.data.registry import compute_word_weights_from_freq_file

        (tmp_path / "freq.txt").write_text("the 1000\ncat 10\nmalformed\n")
        w = compute_word_weights_from_freq_file(
            str(tmp_path / "freq.txt"), {"the": 0, "cat": 1, "dog": 2}, a=1e-3
        )
        # a / (a + p): p(the)=1000/1010, p(cat)=10/1010; unknown → 1.0
        np.testing.assert_allclose(w[0], 1e-3 / (1e-3 + 1000 / 1010), rtol=1e-9)
        np.testing.assert_allclose(w[1], 1e-3 / (1e-3 + 10 / 1010), rtol=1e-9)
        assert w[2] == 1.0


class TestVerifyData:
    """scripts/verify_data.py — the explicit real-data gate (reference
    README.md:9 blobs; .MISSING_LARGE_BLOBS)."""

    def test_missing_dir_fails_with_fetch_instructions(self, tmp_path, capsys):
        import scripts.verify_data as vd

        rc = vd.main(["mosi", "--data_dir", str(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 1
        assert "MISSING" in out and "drive.google.com" in out

    def test_real_geometry_mosi_passes(self, tmp_path, capsys):
        import pickle

        import h5py

        import scripts.verify_data as vd

        (tmp_path / "mosi").mkdir()
        (tmp_path / "data").mkdir()
        np.save(tmp_path / "mosi/glove_300_mosi.npy",
                np.zeros(vd.MOSI["vocab"], np.float32))
        pickle.dump({"w": 0}, open(tmp_path / "mosi/word2ix_300_mosi.pkl", "wb"))
        np.save(tmp_path / "word_weights.npy", np.zeros(3016, np.float32))
        with h5py.File(tmp_path / "data/mosi_data.h5", "w") as f:
            for split, n in vd.MOSI["splits"].items():
                g = f.create_group(split)
                g["facet"] = np.zeros((n, 20, 47), np.float32)
                g["covarep"] = np.zeros((n, 20, 74), np.float32)
                g["text"] = np.zeros((n, 20), np.int64)
                g["lengths"] = np.full(n, 20, np.int64)
                g["label"] = np.zeros(n, np.float32)
                g["id"] = np.arange(n, dtype=np.int64)
        rc = vd.main(["mosi", "--data_dir", str(tmp_path)])
        assert rc == 0, capsys.readouterr().out

    def test_wrong_geometry_rejected(self, tmp_path, capsys):
        import scripts.verify_data as vd

        (tmp_path / "mosi").mkdir()
        np.save(tmp_path / "mosi/glove_300_mosi.npy",
                np.zeros((40, 8), np.float32))  # toy-sized, not real
        rc = vd.main(["mosi", "--data_dir", str(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 1 and "BAD" in out

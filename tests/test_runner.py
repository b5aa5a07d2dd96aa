"""End-to-end runner + CLI smoke tests on tiny synthetic data (CPU)."""

import json
import os

import numpy as np
import pytest

from mmtpu.config import ExperimentConfig
from mmtpu.data.pipeline import prepare_device_data
from mmtpu.data.synthetic import synthesize_dataset
from mmtpu.runner import run_experiment


def _tiny_prep(name="mosi", pos=2, **kw):
    ds = synthesize_dataset(
        name, n_train=30, n_valid=10, n_test=12, vocab_size=60,
        embed_dim=16, audio_dim=6, visual_dim=5,
    )
    return prepare_device_data(ds, pos_embed_dim=pos, pos_mode="baked", **kw)


@pytest.mark.parametrize("e2e", [False, True])
def test_run_experiment_mosi(tmp_path, e2e):
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=3, n_sentiment_epochs=6, batch_size=8,
        e2e=e2e, norm="layer_norm", optimizer="adam", lr=1e-3,
        sentiment_lr=1e-2, config_name="smoke", config_num=0,
    )
    prep = _tiny_prep()
    res = run_experiment(
        cfg, out_root=str(tmp_path), prep=prep, verbose=False, time_test=True
    )
    assert np.isfinite(res["final_train_loss"])
    assert "mae" in res["sentiment"]["after"]
    assert res["closed_form"]["n_utterances"] == 12
    # artifact contract
    folder = tmp_path / "smoke" / "config_0_run_0"
    for f in ("config.json", "embed_loss.txt", "embed_valid_loss.txt",
              "embed_test_loss.txt"):
        assert (folder / f).exists()
    for f in ("embed.npy",):
        assert (folder / "pre" / f).exists()
        assert (folder / "post" / f).exists()
    for f in ("test_acc_before.txt", "acc_after.txt",
              "test_results_after.json", "senti.npz"):
        assert (folder / "post" / f).exists()
    post = np.load(folder / "post" / "embed.npy")
    assert post.shape == (30 + 10 + 12, 16)
    results = json.load(open(folder / "post" / "test_results_after.json"))
    assert set(results) >= {"mae", "accuracy", "corr", "mult_acc", "f_score"}


def test_run_experiment_pom(tmp_path):
    cfg = ExperimentConfig(
        dataset="pom", n_epochs=2, n_sentiment_epochs=4, batch_size=8,
        e2e=False, optimizer="sgd", lr=1e-4, config_name="smokepom",
    )
    prep = _tiny_prep("pom")
    res = run_experiment(cfg, out_root=str(tmp_path), prep=prep, verbose=False)
    after = res["sentiment"]["after"]
    assert len(after["mae"]) == 17  # per-trait lists


def test_run_experiment_unimodal_semi_sup(tmp_path):
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=2, n_sentiment_epochs=4, batch_size=8,
        e2e=False, unimodal=True, semi_sup_idxes="0.5", config_name="smokeuni",
    )
    prep = _tiny_prep()
    res = run_experiment(cfg, out_root=str(tmp_path), prep=prep, verbose=False)
    assert np.isfinite(res["final_train_loss"])


def test_run_experiment_iemocap(tmp_path):
    cfg = ExperimentConfig(
        dataset="iemocap", n_epochs=2, n_sentiment_epochs=4, batch_size=8,
        e2e=False, optimizer="adam", lr=1e-3, config_name="smokeiem",
    )
    prep = _tiny_prep("iemocap")
    res = run_experiment(cfg, out_root=str(tmp_path), prep=prep, verbose=False)
    after = res["sentiment"]["after"]
    assert 0.0 <= after["accuracy"] <= 1.0 and "f_score" in after


@pytest.mark.parametrize("e2e", [False, True])
def test_validation_curve(tmp_path, e2e):
    """Recursive validation-during-training (simplesif.py:146-159; the e2e
    variant mirrors simplesif.py:795-799)."""
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=3, n_sentiment_epochs=4, batch_size=8,
        e2e=e2e, optimizer="sgd", lr=1e-4, config_name="smokeval",
    )
    prep = _tiny_prep()
    res = run_experiment(
        cfg, out_root=str(tmp_path), prep=prep, verbose=False,
        validation_curve=True,
    )
    assert np.isfinite(res["final_train_loss"])
    curve_file = tmp_path / "smokeval" / "config_0_run_0" / "embed_valid_loss.txt"
    vals = [float(x) for x in curve_file.read_text().split()]
    # epoch 0 sample + final validation (valid_every=80 > n_epochs=3)
    assert len(vals) == 2
    assert all(np.isfinite(v) for v in vals)


def test_cli_main(tmp_path, monkeypatch):
    """Full CLI path with reference-format config JSON + synthetic fallback."""
    from mmtpu import run as cli

    cfg_path = tmp_path / "config_5.json"
    json.dump(
        {
            "sentiment_hidden_size": 10, "lr": 1e-3, "sentiment_lr": 1e-2,
            "seq_len": 20, "word_sim_metric": "angular", "n_epochs": 1,
            "freeze_weights": False, "n_sentiment_epochs": 2,
            "word_loss_weight": 0.001, "likelihood_weight": 0.0001,
            "pos_embed_dim": 2, "e2e": True, "norm": "layer_norm",
            "optimizer": "sgd", "config_num": 5,
        },
        open(cfg_path, "w"),
    )
    # shrink the synthetic fallback so the CLI smoke test stays fast
    import mmtpu.data.registry as reg

    orig = reg.synthesize_dataset
    monkeypatch.setattr(
        reg, "synthesize_dataset",
        lambda name, seed=0: orig(
            name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
            embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
        ),
    )
    rc = cli.main([
        str(cfg_path), "mosi", "--data_dir", str(tmp_path / "nodata"),
        "--out_root", str(tmp_path / "saves"), "--config_name", "cli_smoke",
        "--batch_size", "8",
    ])
    assert rc == 0
    assert (tmp_path / "saves" / "cli_smoke" / "config_5_run_0" / "post"
            / "test_results_after.json").exists()


def test_run_experiment_with_pallas_kernel(tmp_path):
    """--pallas wiring: the fused partition kernel (interpret mode on CPU)
    must reproduce the XLA path's results."""
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=2, n_sentiment_epochs=3, batch_size=8,
        e2e=True, optimizer="sgd", lr=1e-4, config_name="smokepallas",
    )
    prep = _tiny_prep()
    res_x = run_experiment(cfg, out_root=str(tmp_path / "a"), prep=prep,
                           verbose=False)
    import dataclasses as dc

    cfg_p = dc.replace(cfg, use_pallas=True)
    res_p = run_experiment(cfg_p, out_root=str(tmp_path / "b"), prep=prep,
                           verbose=False)
    np.testing.assert_allclose(res_p["final_train_loss"],
                               res_x["final_train_loss"], rtol=1e-4)
    np.testing.assert_allclose(res_p["sentiment"]["after"]["mae"],
                               res_x["sentiment"]["after"]["mae"], rtol=1e-3)


def test_suff_stats_path_matches_raw(tmp_path):
    """The sequence-axis-eliminating sufficient-statistics path must
    reproduce the raw per-timestep Gaussian computation."""
    ds = synthesize_dataset(
        "mosi", n_train=30, n_valid=10, n_test=12, vocab_size=60,
        embed_dim=16, audio_dim=6, visual_dim=5,
    )
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=3, n_sentiment_epochs=4, batch_size=8,
        e2e=True, norm="layer_norm", optimizer="adam", lr=1e-3,
        config_name="smokestats",
    )
    prep_raw = prepare_device_data(ds, pos_embed_dim=2, pos_mode="baked",
                                   suff_stats=False)
    prep_st = prepare_device_data(ds, pos_embed_dim=2, pos_mode="baked",
                                  suff_stats=True)
    r_raw = run_experiment(cfg, out_root=str(tmp_path / "a"), prep=prep_raw,
                           verbose=False)
    r_st = run_experiment(cfg, out_root=str(tmp_path / "b"), prep=prep_st,
                          verbose=False)
    np.testing.assert_allclose(r_st["final_train_loss"],
                               r_raw["final_train_loss"], rtol=1e-3)
    np.testing.assert_allclose(r_st["sentiment"]["after"]["mae"],
                               r_raw["sentiment"]["after"]["mae"], rtol=5e-3)


def test_suff_stats_sweep_matches_raw():
    from mmtpu.sweep import run_sweep
    from tests.test_sweep import _grid4

    ds = synthesize_dataset(
        "mosi", n_train=24, n_valid=8, n_test=10, vocab_size=50,
        embed_dim=12, audio_dim=5, visual_dim=4,
    )
    prep_raw = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4),
                                   suff_stats=False)
    prep_st = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4),
                                  suff_stats=True)
    cfgs = _grid4()[:2]
    r_raw = run_sweep(cfgs, prep_raw, batch_size=8, verbose=False)
    r_st = run_sweep(cfgs, prep_st, batch_size=8, verbose=False)
    np.testing.assert_allclose(r_st.final_train_loss, r_raw.final_train_loss,
                               rtol=2e-3)
    np.testing.assert_allclose(r_st.metrics["mae"], r_raw.metrics["mae"],
                               rtol=5e-3)


def test_closed_form_server(tmp_path):
    """Serving wrapper: padding/bucketing, warmup, sentiment chaining."""
    from mmtpu.models.decoder import init_decoder
    from mmtpu.models.sentiment import init_sentiment
    from mmtpu.serve import ClosedFormServer

    import jax

    prep = _tiny_prep(pos=0, suff_stats=False)
    dec = init_decoder(jax.random.key(0), 16, 6, 5, unimodal=False)
    senti = init_sentiment(jax.random.key(1), 16, 8, 1)
    server = ClosedFormServer(dec, batch_sizes=(4, 16), sentiment_params=senti,
                              word_embeddings=prep.vocab_embeddings)
    te = prep.splits["test"]
    req = {k: np.asarray(te[k]) for k in
           ("text_ids", "text_weights", "text_gauss", "audio", "visual")}
    server.warmup({k: v[:2] for k, v in req.items()})
    lat, pred = server(req)  # 12 rows → padded to 16
    assert lat.shape == (12, 16)
    assert pred.shape == (12,)
    np.testing.assert_allclose(np.linalg.norm(lat, axis=-1), 1.0, atol=1e-4)
    # results must be padding-invariant: a 3-row request (pads to 4) equals
    # the first 3 rows of the full request
    lat3, _ = server({k: v[:3] for k, v in req.items()})
    np.testing.assert_allclose(lat3, lat[:3], atol=1e-5)

    # a text_ids request needs the vocab table at construction — the error
    # must be clear, not a NoneType subscript from inside tracing
    bare = ClosedFormServer(dec, batch_sizes=(16,))
    with pytest.raises(ValueError, match="word_embeddings"):
        bare(req)


def test_run_experiment_mesh_matches_single(tmp_path):
    """--mesh wiring: ONE config spanning the 8-device CPU mesh (batch rows
    sharded + vocab table sharded) must match the single-device run."""
    from mmtpu.parallel import make_fit_mesh

    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=2, n_sentiment_epochs=3, batch_size=8,
        e2e=True, optimizer="sgd", lr=1e-4, config_name="smokemesh",
    )
    # vocab 64: divisible by the 2-wide vocab axis
    ds = synthesize_dataset(
        "mosi", n_train=32, n_valid=8, n_test=8, vocab_size=64,
        embed_dim=16, audio_dim=6, visual_dim=5,
    )
    prep = prepare_device_data(ds, pos_embed_dim=0)
    res_1 = run_experiment(cfg, out_root=str(tmp_path / "a"), prep=prep,
                           verbose=False)
    mesh = make_fit_mesh(4, 2)
    res_m = run_experiment(cfg, out_root=str(tmp_path / "b"), prep=prep,
                           verbose=False, mesh=mesh)
    np.testing.assert_allclose(res_m["final_train_loss"],
                               res_1["final_train_loss"], rtol=1e-4)
    np.testing.assert_allclose(res_m["sentiment"]["after"]["mae"],
                               res_1["sentiment"]["after"]["mae"], rtol=1e-3)

    # non-e2e path routes through fit_latents_mesh
    import dataclasses as dc

    cfg2 = dc.replace(cfg, e2e=False)
    res_1b = run_experiment(cfg2, out_root=str(tmp_path / "c"), prep=prep,
                            verbose=False)
    res_mb = run_experiment(cfg2, out_root=str(tmp_path / "d"), prep=prep,
                            verbose=False, mesh=mesh)
    np.testing.assert_allclose(res_mb["final_train_loss"],
                               res_1b["final_train_loss"], rtol=1e-4)


def test_run_experiment_mesh_resume_rejections(tmp_path):
    from mmtpu.parallel import make_fit_mesh

    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=2, n_sentiment_epochs=2, batch_size=8,
        e2e=True, config_name="rej",
    )
    prep = _tiny_prep()
    mesh = make_fit_mesh(4, 2)
    with pytest.raises(ValueError, match="validation_curve"):
        run_experiment(cfg, prep=prep, mesh=mesh, validation_curve=True,
                       save_artifacts=False)
    with pytest.raises(ValueError, match="non-e2e"):
        run_experiment(cfg, prep=prep, resume_dir=str(tmp_path / "ck"),
                       save_artifacts=False)
    import dataclasses as dc

    with pytest.raises(ValueError, match="mutually exclusive"):
        run_experiment(dc.replace(cfg, e2e=False), prep=prep, mesh=mesh,
                       resume_dir=str(tmp_path / "ck"), save_artifacts=False)


def test_cli_resume_dir(tmp_path, monkeypatch):
    """--resume_dir smoke: run, then re-run with the same dir (restores the
    finished fit) — both produce artifacts and a checkpoint manifest."""
    from mmtpu import run as cli

    cfg_path = tmp_path / "config_1.json"
    json.dump(
        {
            "sentiment_hidden_size": 10, "lr": 1e-3, "sentiment_lr": 1e-2,
            "seq_len": 20, "word_sim_metric": "angular", "n_epochs": 2,
            "freeze_weights": False, "n_sentiment_epochs": 2,
            "word_loss_weight": 0.001, "likelihood_weight": 0.0001,
            "pos_embed_dim": 0, "e2e": False, "norm": "layer_norm",
            "optimizer": "sgd", "config_num": 1,
        },
        open(cfg_path, "w"),
    )
    import mmtpu.data.registry as reg

    orig = reg.synthesize_dataset
    monkeypatch.setattr(
        reg, "synthesize_dataset",
        lambda name, seed=0: orig(
            name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
            embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
        ),
    )
    common = [
        str(cfg_path), "mosi", "--data_dir", str(tmp_path / "nodata"),
        "--out_root", str(tmp_path / "saves"), "--config_name", "resume_smoke",
        "--batch_size", "8", "--resume_dir", str(tmp_path / "ckpt"),
    ]
    assert cli.main(common) == 0
    assert (tmp_path / "ckpt" / "manifest.json").exists()
    assert cli.main(common) == 0  # resumes (fit already complete)
    assert (tmp_path / "saves" / "resume_smoke" / "config_1_run_0" / "post"
            / "test_results_after.json").exists()


def test_cli_mesh_flag(tmp_path, monkeypatch):
    """--mesh CLI parsing: explicit sizes build the ('data','vocab') mesh."""
    from mmtpu import run as cli

    cfg_path = tmp_path / "config_2.json"
    json.dump(
        {
            "sentiment_hidden_size": 10, "lr": 1e-3, "sentiment_lr": 1e-2,
            "seq_len": 20, "word_sim_metric": "angular", "n_epochs": 1,
            "freeze_weights": False, "n_sentiment_epochs": 2,
            "word_loss_weight": 0.001, "likelihood_weight": 0.0001,
            "pos_embed_dim": 0, "e2e": True, "norm": "layer_norm",
            "optimizer": "sgd", "config_num": 2,
        },
        open(cfg_path, "w"),
    )
    import mmtpu.data.registry as reg

    orig = reg.synthesize_dataset
    monkeypatch.setattr(
        reg, "synthesize_dataset",
        lambda name, seed=0: orig(
            name, n_train=16, n_valid=8, n_test=8, vocab_size=64,
            embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
        ),
    )
    rc = cli.main([
        str(cfg_path), "mosi", "--data_dir", str(tmp_path / "nodata"),
        "--out_root", str(tmp_path / "saves"), "--config_name", "mesh_smoke",
        "--batch_size", "8", "--mesh", "data=4,vocab=2",
    ])
    assert rc == 0
    assert (tmp_path / "saves" / "mesh_smoke" / "config_2_run_0" / "post"
            / "test_results_after.json").exists()

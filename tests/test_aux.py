"""Tests for legacy models, alternating driver, analysis, scripts, utils,
sweep resume, and the sweep CLI."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLegacyModels:
    def test_audio_visual_generator_matches_torch(self, rng):
        import torch

        from mmtpu.models.legacy import (
            apply_audio_visual_generator,
            init_audio_visual_generator,
        )

        D, A, V, B = 8, 5, 4, 6
        p = init_audio_visual_generator(jax.random.key(0), D, A, V)
        x = rng.standard_normal((B, D)).astype(np.float32)

        lin_a_mu = torch.nn.Linear(D, A)
        lin_a_ls = torch.nn.Linear(D, A)
        with torch.no_grad():
            lin_a_mu.weight.copy_(torch.tensor(np.asarray(p["audio"]["mu"]["w"]).T))
            lin_a_mu.bias.copy_(torch.tensor(np.asarray(p["audio"]["mu"]["b"])))
            lin_a_ls.weight.copy_(
                torch.tensor(np.asarray(p["audio"]["log_sigma"]["w"]).T)
            )
            lin_a_ls.bias.copy_(torch.tensor(np.asarray(p["audio"]["log_sigma"]["b"])))
        want_mu = lin_a_mu(torch.tensor(x)).detach().numpy()
        want_sig = lin_a_ls(torch.tensor(x)).exp().detach().numpy()
        (a_mu, a_sig), _ = apply_audio_visual_generator(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(a_mu), want_mu, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a_sig), want_sig, rtol=1e-5)

    def test_concat_generator(self, rng):
        from mmtpu.models.legacy import (
            apply_concat_generator,
            concat_init_embeddings,
            init_concat_generator,
        )

        p = init_concat_generator(jax.random.key(0), 6, 5, 4, 3)
        (am, asg), (vm, vsg) = apply_concat_generator(
            p,
            jnp.asarray(rng.standard_normal((7, 6)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32)),
        )
        assert am.shape == (7, 4) and vm.shape == (7, 3)
        assert float(asg.min()) > 0
        we = jnp.asarray(rng.standard_normal((7, 10)).astype(np.float32))
        e = concat_init_embeddings(jax.random.key(1), we, 6, 5)
        assert e.shape == (7, 10 + 6 + 5)

    def test_autoencoder(self, rng):
        from mmtpu.models.legacy import apply_autoencoder, init_autoencoder

        p = init_autoencoder(jax.random.key(0), 4, 8, 6, 5, 3)
        x = jnp.asarray(rng.standard_normal((9, 14)).astype(np.float32))
        lat, out = apply_autoencoder(p, x)
        assert lat.shape == (9, 4) and out.shape == (9, 14)

    def test_lstm_autoencoder_matches_torch(self, rng):
        """Cell math parity with torch.nn.LSTM + the reference's
        teacher-forced decode loop (models.py:83-105)."""
        import torch

        from mmtpu.models.legacy import apply_lstm_autoencoder, init_lstm_autoencoder

        D, A, V, H, B, L = 4, 3, 2, 5, 3, 6
        F = D + A + V
        p = init_lstm_autoencoder(jax.random.key(0), H, D, A, V)
        x = rng.standard_normal((B, L, F)).astype(np.float32)

        enc = torch.nn.LSTM(F, H)
        dec = torch.nn.LSTM(F, H)
        pred = torch.nn.Linear(H, F)
        with torch.no_grad():
            for mod, pp in ((enc, p["encoder"]), (dec, p["decoder"])):
                mod.weight_ih_l0.copy_(torch.tensor(np.asarray(pp["w_ih"]).T))
                mod.weight_hh_l0.copy_(torch.tensor(np.asarray(pp["w_hh"]).T))
                mod.bias_ih_l0.copy_(torch.tensor(np.asarray(pp["b_ih"])))
                mod.bias_hh_l0.copy_(torch.tensor(np.asarray(pp["b_hh"])))
            pred.weight.copy_(torch.tensor(np.asarray(p["pred"]["w"]).T))
            pred.bias.copy_(torch.tensor(np.asarray(p["pred"]["b"])))

        inputs = torch.tensor(x).permute(1, 0, 2)
        _, (h_enc, c_enc) = enc(inputs)
        xx = torch.zeros(1, B, F)
        state = (h_enc, c_enc)
        seq = []
        for i in range(L):
            out, state = dec(xx, state)
            xx = inputs[i : i + 1]
            seq.append(pred(out))
        want = torch.cat(seq, dim=0).permute(1, 0, 2).detach().numpy()
        want_lat = h_enc[0].detach().numpy()

        lat, recon = apply_lstm_autoencoder(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(lat), want_lat, atol=1e-5)
        np.testing.assert_allclose(np.asarray(recon), want, atol=1e-5)


class TestAlternating:
    def test_fit_alternating_decreases_loss(self, rng):
        from mmtpu.models.legacy import init_audio_visual_generator
        from mmtpu.train.alternating import AlternatingFitSpec, fit_alternating

        n, L, V, D, A, Vi = 20, 6, 40, 8, 5, 4
        vocab = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
        ids = rng.integers(0, V, size=(n, L))
        data = {
            "text": vocab[jnp.asarray(ids)],
            "text_weights": jnp.asarray(rng.random((n, L)).astype(np.float32)),
            "text_mask": jnp.ones((n, L)),
            "audio": jnp.asarray(rng.standard_normal((n, L, A)).astype(np.float32)),
            "audio_mask": jnp.ones((n, L, A)),
            "visual": jnp.asarray(rng.standard_normal((n, L, Vi)).astype(np.float32)),
            "visual_mask": jnp.ones((n, L, Vi)),
        }
        params = init_audio_visual_generator(jax.random.key(0), D, A, Vi)
        spec = AlternatingFitSpec(n_epochs=5, batch_size=8)
        lat, params2, losses = fit_alternating(
            params, data, vocab, lr=1e-3, word_loss_weight=0.001, spec=spec
        )
        losses = np.asarray(losses)
        assert lat.shape == (n, D)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        # the prepared-data ids-stream convention (text_ids, no pre-gathered
        # text) must give the identical fit
        data_ids = {k: v for k, v in data.items() if k != "text"}
        data_ids["text_ids"] = jnp.asarray(ids, jnp.int32)
        lat2, _, losses2 = fit_alternating(
            params, data_ids, vocab, lr=1e-3, word_loss_weight=0.001, spec=spec
        )
        np.testing.assert_array_equal(np.asarray(lat2), np.asarray(lat))
        np.testing.assert_array_equal(np.asarray(losses2), losses)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(lat), axis=-1), 1.0, atol=1e-4
        )


class TestAnalysis:
    def test_get_closest_words(self, rng):
        from mmtpu.analysis import get_closest_words

        we = rng.standard_normal((20, 8)).astype(np.float32)
        word2ix = {f"w{i}": i for i in range(20)}
        emb = we[[3, 7]] * 2.0  # scaled copies → closest word is itself
        out = get_closest_words(emb, we, word2ix, k=3)
        assert out[0][0] == "w3"
        assert out[1][0] == "w7"


class TestScripts:
    def test_result_table_roundtrip(self, tmp_path, rng):
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        import make_result_table as mrt

        from mmtpu.io.artifacts import ArtifactStore

        for cn in (0, 1):
            store = ArtifactStore(str(tmp_path / "saves"), "sweepx", cn, 0)
            store.save_config({"lr": 1e-3, "optimizer": "sgd", "config_num": cn})
            store.save_results("post", "before", {"accuracy": 0.5 + cn / 10, "mae": 1.0})
            store.save_results("post", "after", {"accuracy": 0.6 + cn / 10, "mae": 0.9})
        rc = mrt.main(["sweepx", "--saves", str(tmp_path / "saves"),
                       "--out", str(tmp_path / "results")])
        assert rc == 0
        import pandas as pd

        df = pd.read_csv(tmp_path / "results" / "sweepx.csv")
        assert len(df) == 2
        assert "post_acc_after" in df.columns
        assert abs(df["post_acc_after"].iloc[1] - 0.7) < 1e-9

        import plot_improvement as pi

        rc = pi.main([str(tmp_path / "results" / "sweepx.csv"),
                      "--metric", "post_acc_after",
                      "--baseline_metric", "post_acc_before",
                      "--out", str(tmp_path / "plot.png")])
        assert rc == 0
        assert (tmp_path / "plot.png").exists()


class TestUtils:
    def test_check_finite(self):
        from mmtpu.utils import FiniteError, check_finite

        check_finite({"a": jnp.ones(3)})
        with pytest.raises(FiniteError):
            check_finite({"a": jnp.asarray([1.0, np.nan])}, where="test")

    def test_step_timer(self):
        from mmtpu.utils import StepTimer

        t = StepTimer(warmup=1)
        out = t.time_fn(lambda x: x * 2, jnp.ones(4), iters=3)
        assert np.allclose(np.asarray(out), 2.0)
        s = t.summary()
        assert s["n"] == 3

    def test_metrics_logger(self, tmp_path):
        from mmtpu.utils import MetricsLogger

        ml = MetricsLogger(str(tmp_path / "m.jsonl"))
        ml.log(step=1, loss=2.0)
        ml.close()
        rec = json.loads(open(tmp_path / "m.jsonl").read().strip())
        assert rec["loss"] == 2.0


class TestSweepResume:
    def test_chunked_fit_matches_monolithic_and_resumes(self, tmp_path):
        """Epoch-chunked fit == monolithic fit EXACTLY; a killed run resumes
        at the last segment boundary and still matches."""
        import jax
        import jax.numpy as jnp

        from mmtpu.data.pipeline import prepare_device_data
        from mmtpu.data.synthetic import synthesize_dataset
        from mmtpu.io.checkpoint import Checkpointer
        from mmtpu.models.decoder import NORM_CODES, init_decoder
        from mmtpu.train.chunked import fit_latents_checkpointed
        from mmtpu.train.latents import LatentFitSpec, fit_latents, train_view
        from mmtpu.train.optim import OPT_CODES

        ds = synthesize_dataset("mosi", n_train=20, n_valid=6, n_test=6,
                                vocab_size=40, embed_dim=8, audio_dim=4,
                                visual_dim=3)
        prep = prepare_device_data(ds, pos_embed_dim=0)
        data = {k: jnp.asarray(v)
                for k, v in train_view(prep.splits["train"]).items()}
        vocab = jnp.asarray(prep.vocab_embeddings)
        init_e = jnp.asarray(prep.sif_init["train"])
        dec = init_decoder(jax.random.key(1), 8, 4, 3, unimodal=False)
        hp = {"lr": jnp.float32(1e-3), "word_loss_weight": jnp.float32(0.001),
              "opt_code": jnp.int32(OPT_CODES["adam"]),
              "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
              "n_epochs": jnp.int32(7)}
        spec = LatentFitSpec(n_epochs_max=7, batch_size=8, train_decoder=True,
                             unimodal=False)
        rng = jax.random.key(0)
        e_mono, dec_mono, l_mono = jax.jit(fit_latents, static_argnums=(6,))(
            rng, init_e, dec, data, vocab, hp, spec)

        # chunked, uninterrupted (3-epoch segments + a 1-epoch tail)
        e_c, dec_c, l_c = fit_latents_checkpointed(
            rng, init_e, dec, data, vocab, hp, spec, segment_epochs=3)
        np.testing.assert_array_equal(np.asarray(e_c), np.asarray(e_mono))
        np.testing.assert_array_equal(np.asarray(l_c), np.asarray(l_mono))
        for a, b in zip(jax.tree.leaves(dec_c), jax.tree.leaves(dec_mono)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # kill/restart: die right after the first segment checkpoint, then
        # resume — must skip epochs 0-2 and still equal the monolithic fit
        ck_dir2 = str(tmp_path / "fitck2")
        ck3 = Checkpointer(ck_dir2)
        # save only the first segment by monkeypatching save to stop after 1
        calls = {"n": 0}
        orig_save = ck3.save

        def save_once(step, tree, extra=None):
            calls["n"] += 1
            out = orig_save(step, tree, extra)
            if calls["n"] == 1:
                raise KeyboardInterrupt  # simulate a kill mid-run
            return out

        ck3.save = save_once
        with pytest.raises(KeyboardInterrupt):
            fit_latents_checkpointed(rng, init_e, dec, data, vocab, hp, spec,
                                     checkpointer=ck3, segment_epochs=3)
        ck3.save = orig_save
        assert ck3.latest_step() == 3
        e_r, dec_r, l_r = fit_latents_checkpointed(
            rng, init_e, dec, data, vocab, hp, spec, checkpointer=ck3,
            segment_epochs=3, verbose=True)
        np.testing.assert_array_equal(np.asarray(e_r), np.asarray(e_mono))
        np.testing.assert_array_equal(np.asarray(l_r), np.asarray(l_mono))

        # a checkpoint from a DIFFERENT fit must be refused, not spliced:
        # resuming the same dir with a changed lr restarts at epoch 0 and
        # reproduces the changed fit exactly
        hp2 = dict(hp, lr=jnp.float32(5e-4))
        e_m2, _, l_m2 = jax.jit(fit_latents, static_argnums=(6,))(
            rng, init_e, dec, data, vocab, hp2, spec)
        e_f, _, l_f = fit_latents_checkpointed(
            rng, init_e, dec, data, vocab, hp2, spec, checkpointer=ck3,
            segment_epochs=3)
        np.testing.assert_array_equal(np.asarray(e_f), np.asarray(e_m2))
        np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_m2))

    def test_resume_skips_completed_chunks(self, tmp_path):
        from mmtpu.data.pipeline import prepare_device_data
        from mmtpu.data.synthetic import synthesize_dataset
        from mmtpu.sweep import run_sweep
        from tests.test_sweep import _grid4

        ds = synthesize_dataset("mosi", n_train=24, n_valid=8, n_test=10,
                                vocab_size=50, embed_dim=12, audio_dim=5,
                                visual_dim=4)
        prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
        cfgs = _grid4()
        ck = str(tmp_path / "ck")
        r1 = run_sweep(cfgs, prep, batch_size=8, chunk_size=2, verbose=False,
                       checkpoint_dir=ck)
        state = json.load(open(os.path.join(ck, "sweep_state.json")))
        # _grid4 mixes sgd/adam → one bucket-scoped chunk per optimizer
        assert len(state["chunks"]) == 2
        # resume: all chunks complete → instant, same results
        r2 = run_sweep(cfgs, prep, batch_size=8, chunk_size=2, verbose=False,
                       checkpoint_dir=ck)
        np.testing.assert_allclose(r1.final_train_loss, r2.final_train_loss)
        np.testing.assert_allclose(r1.metrics["mae"], r2.metrics["mae"])
        # partial resume: mark only the first chunk complete
        state["chunks"] = state["chunks"][:1]
        json.dump(state, open(os.path.join(ck, "sweep_state.json"), "w"))
        r3 = run_sweep(cfgs, prep, batch_size=8, chunk_size=2, verbose=False,
                       checkpoint_dir=ck)
        np.testing.assert_allclose(r1.final_train_loss, r3.final_train_loss,
                                   rtol=1e-5)


class TestSweepCLI:
    def test_cli_end_to_end(self, tmp_path, monkeypatch):
        import mmtpu.data.registry as reg
        from mmtpu.sweep import __main__ as cli

        orig = reg.synthesize_dataset
        monkeypatch.setattr(
            reg, "synthesize_dataset",
            lambda name, seed=0: orig(
                name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
                embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
            ),
        )
        rc = cli.main([
            "mosi", "--limit", "3", "--chunk_size", "3", "--batch_size", "8",
            "--data_dir", str(tmp_path / "nodata"),
            "--out", str(tmp_path / "results"), "--name", "clisweep",
        ])
        assert rc == 0
        assert (tmp_path / "results" / "clisweep.csv").exists()
        summary = json.load(open(tmp_path / "results" / "clisweep_summary.json"))
        assert summary["n_configs"] == 3


class TestCheckpointer:
    def test_save_restore_roundtrip(self, tmp_path):
        from mmtpu.io.checkpoint import Checkpointer

        ck = Checkpointer(str(tmp_path / "ck"), keep=2)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        assert ck.latest_step() is None
        ck.save(1, tree, extra={"epoch": 1})
        tree2 = jax.tree.map(lambda x: x * 2, tree)
        ck.save(5, tree2, extra={"epoch": 5})
        got, step, extra = ck.restore(jax.tree.map(jnp.zeros_like, tree))
        assert step == 5 and extra == {"epoch": 5}
        np.testing.assert_allclose(np.asarray(got["a"]), np.arange(4.0) * 2)
        # garbage collection keeps only the last 2
        ck.save(9, tree)
        assert sorted(ck.steps()) == [5, 9]
        # restore a specific older step
        got5, _, _ = ck.restore(jax.tree.map(jnp.zeros_like, tree), step=5)
        np.testing.assert_allclose(np.asarray(got5["b"]["c"]), 2.0)


class TestSweepTopK:
    def test_top_k_artifacts(self, tmp_path, monkeypatch):
        import mmtpu.data.registry as reg
        from mmtpu.sweep import __main__ as cli

        orig = reg.synthesize_dataset
        monkeypatch.setattr(
            reg, "synthesize_dataset",
            lambda name, seed=0: orig(
                name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
                embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
            ),
        )
        monkeypatch.chdir(tmp_path)
        rc = cli.main([
            "mosi", "--limit", "3", "--chunk_size", "3", "--batch_size", "8",
            "--data_dir", str(tmp_path / "nodata"),
            "--out", str(tmp_path / "results"), "--name", "topk",
            "--top_k_artifacts", "1",
        ])
        assert rc == 0
        import glob

        saved = glob.glob(str(tmp_path / "model_saves" / "topk" /
                              "config_*_run_0" / "post" /
                              "test_results_after.json"))
        assert len(saved) == 1

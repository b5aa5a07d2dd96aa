"""Closed-form warm start (mmtpu/train/warm_start.py): the suff-stats path
reproduces the raw closed-form estimator (sif2.py:164-208) exactly, masked
statistics match a truncated unpadded sequence, and the sweep/CLI plumbing
(`infer_warm_start` / `infer_epochs_cap`) works end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtpu.models.decoder import MMB2_HEADS, init_decoder
from mmtpu.ops.closed_form import closed_form_latents
from mmtpu.ops.gaussian import gaussian_suff_stats
from mmtpu.serve import assemble_head_data
from mmtpu.train.warm_start import closed_form_latents_from_stats


def _manual(B=6, L=9, D=12, A=5, V=4, vocab=40, seed=0):
    r = np.random.RandomState(seed)
    we = r.randn(vocab, D).astype(np.float32)
    ids = r.randint(0, vocab, (B, L)).astype(np.int32)
    w_tok = (r.rand(B, L) + 0.1).astype(np.float32)
    audio = r.randn(B, L, A).astype(np.float32)
    visual = r.randn(B, L, V).astype(np.float32)
    tg = we[ids]
    return we, ids, w_tok, audio, visual, tg


def _stats_dict(ids, w_tok, audio, visual, tg, mask):
    d = {
        "text_ids": jnp.asarray(ids),
        "text_weights": jnp.asarray(w_tok),
        "text_mask": jnp.asarray(mask),
    }
    for name, x in (("audio", audio), ("visual", visual), ("text_gauss", tg)):
        s0, s1, s2 = gaussian_suff_stats(jnp.asarray(x), jnp.asarray(mask))
        d[f"{name}_s0"], d[f"{name}_s1"], d[f"{name}_s2"] = s0, s1, s2
    return d


class TestStatsEquivalence:
    def test_matches_raw_closed_form_all_ones_mask(self):
        """With all-ones masks the masked statistics equal the reference's
        unmasked sums, so the stats path must reproduce closed_form_latents
        (the serving estimator) to float tolerance."""
        we, ids, w_tok, audio, visual, tg = _manual()
        mask = np.ones(ids.shape, np.float32)
        dec = init_decoder(jax.random.key(0), we.shape[1], audio.shape[-1],
                           visual.shape[-1], unimodal=False,
                           text_dim=tg.shape[-1])

        raw = closed_form_latents(
            assemble_head_data(
                {"text_gauss": jnp.asarray(tg), "audio": jnp.asarray(audio),
                 "visual": jnp.asarray(visual)}, MMB2_HEADS),
            dec["heads"], jnp.asarray(w_tok), jnp.asarray(tg),
        )
        st = closed_form_latents_from_stats(
            dec, _stats_dict(ids, w_tok, audio, visual, tg, mask),
            jnp.asarray(we))
        np.testing.assert_allclose(np.asarray(st), np.asarray(raw),
                                   rtol=2e-4, atol=2e-5)

    def test_masked_stats_equal_truncated_sequence(self):
        """Masked statistics exclude padding exactly: garbage in the padded
        tail must not change the estimate vs the truncated valid sequence
        (the warm start's documented deviation from the mask-ignoring
        reference estimator)."""
        we, ids, w_tok, audio, visual, tg = _manual(L=9)
        Lv = 6
        mask = np.zeros(ids.shape, np.float32)
        mask[:, :Lv] = 1.0
        w_tok[:, Lv:] = 0.0  # pipeline zeroes padded token weights
        # poison the padded tail — must be invisible through the stats
        audio[:, Lv:] = 1e3
        visual[:, Lv:] = -1e3
        tg[:, Lv:] = 7e2
        dec = init_decoder(jax.random.key(1), we.shape[1], audio.shape[-1],
                           visual.shape[-1], unimodal=False,
                           text_dim=tg.shape[-1])

        st = closed_form_latents_from_stats(
            dec, _stats_dict(ids, w_tok, audio, visual, tg, mask),
            jnp.asarray(we))
        trunc = closed_form_latents(
            assemble_head_data(
                {"text_gauss": jnp.asarray(tg[:, :Lv]),
                 "audio": jnp.asarray(audio[:, :Lv]),
                 "visual": jnp.asarray(visual[:, :Lv])}, MMB2_HEADS),
            dec["heads"], jnp.asarray(w_tok[:, :Lv]),
            jnp.asarray(tg[:, :Lv]),
        )
        np.testing.assert_allclose(np.asarray(st), np.asarray(trunc),
                                   rtol=2e-4, atol=2e-5)

    def test_raw_layout_rejected(self):
        we, ids, w_tok, audio, visual, tg = _manual()
        dec = init_decoder(jax.random.key(0), we.shape[1], audio.shape[-1],
                           visual.shape[-1], unimodal=False,
                           text_dim=tg.shape[-1])
        raw_d = {"text_ids": jnp.asarray(ids),
                 "text_weights": jnp.asarray(w_tok),
                 "text_mask": jnp.ones(ids.shape, jnp.float32),
                 "audio": jnp.asarray(audio),
                 "audio_mask": jnp.ones(ids.shape, jnp.float32),
                 "visual": jnp.asarray(visual),
                 "visual_mask": jnp.ones(ids.shape, jnp.float32),
                 "text_gauss": jnp.asarray(tg),
                 "text_gauss_mask": jnp.ones(ids.shape, jnp.float32)}
        with pytest.raises(ValueError, match="suff-stats"):
            closed_form_latents_from_stats(dec, raw_d, jnp.asarray(we))


class TestSweepWarmStart:
    def _run(self, **kw):
        from mmtpu.data.pipeline import prepare_device_data
        from mmtpu.data.synthetic import synthesize_dataset
        from mmtpu.sweep import run_sweep
        from tests.test_sweep import _grid4

        ds = synthesize_dataset(
            "mosi", n_train=24, n_valid=8, n_test=10, vocab_size=50,
            embed_dim=12, audio_dim=5, visual_dim=4,
        )
        prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
        return run_sweep(_grid4(), prep, batch_size=8, chunk_size=4,
                         verbose=False, **kw)

    def test_warm_start_and_cap_change_results_but_stay_finite(self):
        base = self._run()
        warm = self._run(infer_warm_start=True, infer_epochs_cap=2)
        assert warm.n_configs == base.n_configs
        for k, v in warm.metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        # a different inference init must actually reach the metrics
        # (otherwise the flag silently plumbs to nothing)
        assert not np.allclose(warm.metrics["mae"], base.metrics["mae"])
        # the TRAIN fit is untouched — reference-parity losses stay identical
        np.testing.assert_allclose(warm.final_train_loss,
                                   base.final_train_loss, rtol=1e-6)

    def test_unimodal_warm_start_finite(self):
        """MMB1 (audio/visual heads only) exercises the head-subset path."""
        warm = self._run(unimodal=True, infer_warm_start=True,
                         infer_epochs_cap=2)
        for k, v in warm.metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k

    def test_cap_noop_when_above_n_epochs(self):
        """A cap >= every config's n_epochs changes nothing (the clamp and
        the scan-length cut are both inert)."""
        base = self._run()
        capped = self._run(infer_epochs_cap=50)
        for k in base.metrics:
            np.testing.assert_allclose(capped.metrics[k], base.metrics[k],
                                       rtol=1e-6, atol=1e-7, err_msg=k)


class TestStatsServing:
    """stats_request + ClosedFormServer's suff-stats path: same estimate,
    ~L-fold smaller request payloads (mmtpu/serve.py)."""

    def _server_and_req(self, senti=False, vocab=True):
        from mmtpu.models.sentiment import init_sentiment
        from mmtpu.serve import ClosedFormServer

        we, ids, w_tok, audio, visual, tg = _manual(B=6, L=9)
        dec = init_decoder(jax.random.key(2), we.shape[1], audio.shape[-1],
                           visual.shape[-1], unimodal=False,
                           text_dim=tg.shape[-1])
        server = ClosedFormServer(
            dec, batch_sizes=(4, 8),
            sentiment_params=(init_sentiment(jax.random.key(3), we.shape[1],
                                             8, 1) if senti else None),
            word_embeddings=we if vocab else None,
        )
        req = {"text_ids": ids, "text_weights": w_tok, "text_gauss": tg,
               "audio": audio, "visual": visual}
        return server, req

    def test_stats_request_matches_raw_path(self):
        from mmtpu.serve import stats_request

        server, req = self._server_and_req(senti=True)
        lat_raw, pred_raw = server(req)
        sreq = stats_request(req)
        lat_st, pred_st = server(sreq)
        np.testing.assert_allclose(lat_st, lat_raw, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(pred_st, pred_raw, rtol=2e-3, atol=2e-4)
        # the compression claim: stats payload is several-fold smaller
        raw_b = sum(np.asarray(v).nbytes for v in req.values())
        st_b = sum(np.asarray(v).nbytes for v in sreq.values())
        assert st_b * 2 < raw_b, (st_b, raw_b)

    def test_masked_stats_request_equals_truncated(self):
        from mmtpu.serve import stats_request

        server, req = self._server_and_req()
        Lv = 6
        mask = np.zeros(req["text_ids"].shape, np.float32)
        mask[:, :Lv] = 1.0
        req["text_weights"][:, Lv:] = 0.0
        for k in ("text_gauss", "audio", "visual"):
            req[k][:, Lv:] = 1e3  # poison the padded tail
        masks = {k: mask for k in ("text_gauss", "audio", "visual")}
        lat_m, _ = server(stats_request(req, masks=masks))
        trunc = {k: (v[:, :Lv] if k != "text_ids" else v)
                 for k, v in req.items()}
        # text term: padded token weights are zero, so full-length ids are
        # equivalent; truncate the Gaussian streams + weights only
        lat_t, _ = server({"text_ids": req["text_ids"][:, :Lv],
                           "text_weights": req["text_weights"][:, :Lv],
                           "text_gauss": trunc["text_gauss"],
                           "audio": trunc["audio"],
                           "visual": trunc["visual"]})
        np.testing.assert_allclose(lat_m, lat_t, rtol=2e-4, atol=2e-5)

    def test_stats_ladder_padding_invariant(self):
        from mmtpu.serve import stats_request

        server, req = self._server_and_req()
        sreq = stats_request(req)
        full, _ = server(sreq)  # 6 rows → pads to 8
        part, _ = server({k: v[:3] for k, v in sreq.items()})  # pads to 4
        np.testing.assert_allclose(part, full[:3], atol=1e-5)

    def test_stats_request_needs_vocab_or_text(self):
        from mmtpu.serve import stats_request

        server, req = self._server_and_req(vocab=False)
        with pytest.raises(ValueError, match="word_embeddings"):
            server(stats_request(req))


def test_sweep_cli_warm_start_flags(tmp_path, monkeypatch):
    """`python -m mmtpu.sweep --infer_warm_start --infer_epochs 2` reaches
    run_sweep and completes."""
    import json

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
        "mosi", "--limit", "2", "--chunk_size", "2", "--batch_size", "8",
        "--infer_warm_start", "--infer_epochs", "2",
        "--data_dir", str(tmp_path / "nodata"),
        "--out", str(tmp_path / "results"), "--name", "warmcli",
    ])
    assert rc == 0
    summary = json.load(open(tmp_path / "results" / "warmcli_summary.json"))
    assert summary["n_configs"] == 2

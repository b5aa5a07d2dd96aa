"""Sweep correctness: vmap/padding mechanisms are exactly equivalent to
standalone runs, chunking is invariant, and mesh sharding works on the
virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtpu.data.pipeline import prepare_device_data
from mmtpu.data.synthetic import synthesize_dataset
from mmtpu.sweep import run_sweep
from mmtpu.sweep.pack import pack_configs, statics_from_configs


def _tiny_prep(pos_max=4, name="mosi"):
    ds = synthesize_dataset(
        name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
        embed_dim=12, audio_dim=5, visual_dim=4,
    )
    return prepare_device_data(
        ds, pos_embed_dim=pos_max, pos_mode="shared", pos_max_dim=pos_max
    )


def _grid4():
    base = {
        "seq_len": 20, "word_sim_metric": "angular", "freeze_weights": False,
        "n_sentiment_epochs": 6, "e2e": True,
    }
    out = []
    for i, (lr, opt, norm, pos, hid, ne) in enumerate([
        (1e-3, "sgd", "layer_norm", 2, 8, 2),
        (1e-4, "adam", "batch_norm", 4, 12, 3),
        (1e-3, "adam", "layer_norm", 2, 12, 3),
        (1e-4, "sgd", "batch_norm", 4, 8, 2),
    ]):
        out.append(dict(
            base, lr=lr, optimizer=opt, norm=norm, pos_embed_dim=pos,
            sentiment_hidden_size=hid, n_epochs=ne, sentiment_lr=1e-2,
            word_loss_weight=0.001, likelihood_weight=0.0001, config_num=i,
        ))
    return out


class TestPack:
    def test_pack_shapes(self):
        cfgs = _grid4()
        statics = statics_from_configs(cfgs, batch_size=8)
        hp = pack_configs(cfgs, statics)
        assert statics.pos_max == 4 and statics.hidden_max == 12
        assert statics.n_epochs_max == 3
        np.testing.assert_array_equal(hp["pos_mask"][0], [1, 1, 0, 0])
        np.testing.assert_array_equal(hp["pos_mask"][1], [1, 1, 1, 1])
        assert hp["opt_code"].tolist() == [0, 1, 1, 0]

    def test_mixed_modes_rejected(self):
        cfgs = _grid4()
        cfgs[0]["e2e"] = False
        with pytest.raises(ValueError):
            statics_from_configs(cfgs)


class TestSweep:
    def test_runs_and_scores(self):
        prep = _tiny_prep()
        res = run_sweep(_grid4(), prep, batch_size=8, verbose=False)
        assert res.n_configs == 4
        assert np.isfinite(res.final_train_loss).all()
        for k in ("mae", "corr", "mult_acc", "f_score", "accuracy"):
            assert res.metrics[k].shape == (4,)
            assert np.isfinite(res.metrics[k]).all()

    def test_chunking_invariance(self):
        prep = _tiny_prep()
        cfgs = _grid4()
        r_all = run_sweep(cfgs, prep, batch_size=8, verbose=False)
        r_chunked = run_sweep(cfgs, prep, batch_size=8, chunk_size=2, verbose=False)
        # padding path: chunk of 3 pads the last chunk
        r_padded = run_sweep(cfgs, prep, batch_size=8, chunk_size=3, verbose=False)
        np.testing.assert_allclose(
            r_all.final_train_loss, r_chunked.final_train_loss, rtol=1e-5
        )
        np.testing.assert_allclose(
            r_all.final_train_loss, r_padded.final_train_loss, rtol=1e-5
        )
        np.testing.assert_allclose(
            r_all.metrics["mae"], r_chunked.metrics["mae"], rtol=1e-5
        )
        np.testing.assert_allclose(
            r_all.metrics["mae"], r_padded.metrics["mae"], rtol=1e-5
        )

    def test_masked_pos_channels_are_inert(self):
        """Garbage in the decoder weights of masked positional channels must
        not change any result — proves the channel-mask padding mechanism."""
        prep = _tiny_prep()
        cfgs = _grid4()[:2]
        cfgs[1]["pos_embed_dim"] = 2  # both configs use 2 of 4 channels

        from mmtpu.sweep import runner as R
        orig_init = R.init_decoder
        bumps = {}

        def poisoned_init(key, embed_dim, audio_dim, visual_dim, **kw):
            p = orig_init(key, embed_dim, audio_dim, visual_dim, **kw)
            # audio head layout: [audio(5+4pos)] — poison the last 2 pos cols
            for hname, h in p["heads"].items():
                w = h["w_mu"]
                h["w_mu"] = w.at[:, -2:].set(1e3) if hname == "audio" else w
            return p

        r_clean = run_sweep(cfgs, prep, batch_size=8, verbose=False)
        try:
            R.init_decoder = poisoned_init
            r_poisoned = run_sweep(cfgs, prep, batch_size=8, verbose=False)
        finally:
            R.init_decoder = orig_init
        np.testing.assert_allclose(
            r_clean.final_train_loss, r_poisoned.final_train_loss, rtol=1e-6
        )
        np.testing.assert_allclose(
            r_clean.metrics["mae"], r_poisoned.metrics["mae"], rtol=1e-6
        )

    def test_hidden_padding_equivalence(self):
        """Zero-padded hidden units stay dead: padded MLP == unpadded MLP
        through full training."""
        from mmtpu.models.sentiment import apply_sentiment, init_sentiment
        from mmtpu.train.sentiment import SentimentFitSpec, fit_sentiment

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((20, 6)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal(20).astype(np.float32))
        key = jax.random.key(3)
        p_small = init_sentiment(key, 6, 5, 1)
        p_padded = init_sentiment(key, 6, 5, 1, hidden_pad=9)
        hp = {"lr": jnp.float32(0.05), "lr_decay": jnp.float32(0.5),
              "n_epochs": jnp.int32(6)}
        spec = SentimentFitSpec(n_epochs_max=6, early_stopping=True)
        fk = jax.random.key(4)
        last_s, _, tl_s, _ = fit_sentiment(fk, p_small, x, y, x, y, hp, spec)
        last_p, _, tl_p, _ = fit_sentiment(fk, p_padded, x, y, x, y, hp, spec)
        np.testing.assert_allclose(np.asarray(tl_s), np.asarray(tl_p), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(apply_sentiment(last_s, x)),
            np.asarray(apply_sentiment(last_p, x)),
            atol=1e-6,
        )

    def test_mesh_sharded_sweep(self):
        """8-config sweep sharded across the 8 virtual CPU devices."""
        from mmtpu.parallel import make_mesh

        assert len(jax.devices()) == 8
        prep = _tiny_prep()
        cfgs = (_grid4() + _grid4())[:8]
        for i, c in enumerate(cfgs):
            c = dict(c)
            c["config_num"] = i
            cfgs[i] = c
        mesh = make_mesh()
        res = run_sweep(cfgs, prep, batch_size=8, mesh=mesh, verbose=False)
        assert res.n_configs == 8
        assert np.isfinite(res.final_train_loss).all()
        # sharded result == unsharded result
        res1 = run_sweep(cfgs, prep, batch_size=8, verbose=False)
        np.testing.assert_allclose(
            res.final_train_loss, res1.final_train_loss, rtol=1e-4
        )

    def test_pom_sweep(self):
        prep = _tiny_prep(name="pom")
        res = run_sweep(_grid4(), prep, batch_size=8, verbose=False)
        assert res.metrics["mae"].shape == (4, 17)


class TestCollectives:
    def test_sharded_angular_partition(self, rng):
        from mmtpu.ops.wordprob import angular_partition
        from mmtpu.parallel import make_mesh, sharded_angular_partition

        lat = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
        mesh = make_mesh(axis_names=("vocab",))
        got = sharded_angular_partition(lat, vocab, mesh)
        want = angular_partition(lat, vocab)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


class TestSeqSharding:
    def test_sharded_gaussian_logpdf(self, rng):
        from mmtpu.ops.gaussian import gaussian_logpdf_masked
        from mmtpu.parallel import make_mesh, sharded_gaussian_logpdf

        B, L, F = 4, 16, 6
        mu = jnp.asarray(rng.standard_normal((B, F)).astype(np.float32))
        sigma = jnp.asarray(np.exp(rng.standard_normal((B, F)) * 0.2).astype(np.float32))
        values = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))
        mask = jnp.asarray((rng.random((B, L, F)) < 0.8).astype(np.float32))
        mesh = make_mesh(axis_names=("seq",))
        got = sharded_gaussian_logpdf(mu, sigma, values, mask, mesh)
        want = gaussian_logpdf_masked(mu, sigma, values, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


class TestMultiRun:
    def test_n_runs_expansion(self):
        prep = _tiny_prep()
        cfgs = _grid4()[:2]
        res = run_sweep(cfgs, prep, batch_size=8, n_runs=2, verbose=False)
        assert res.n_configs == 4
        assert res.run_idxs.tolist() == [0, 1, 0, 1]
        assert res.config_nums.tolist() == [0, 0, 1, 1]
        # different seeds → different results per run
        assert res.final_train_loss[0] != res.final_train_loss[1]
        recs = res.to_records()
        assert recs[1]["run"] == 1


class TestChunkFallback:
    def test_failed_wide_dispatch_retries_narrower(self, monkeypatch):
        """A device failure at a wide chunk retries the sweep at half width."""
        from mmtpu.sweep import runner as R

        prep = _tiny_prep()
        cfgs = _grid4()
        orig_build = R.build_sweep_fn
        calls = {"n": 0}

        # patch build to raise on the first call only when 4 configs wide
        def build_with_width(statics, *a, **kw):
            fn = orig_build(statics, *a, **kw)

            def wrapped(rngs, *args, **kwargs):
                calls["n"] += 1
                if calls["n"] == 1 and rngs.shape[0] == 4:
                    raise jax.errors.JaxRuntimeError("UNAVAILABLE: synthetic")
                return fn(rngs, *args, **kwargs)

            return wrapped

        monkeypatch.setattr(R, "build_sweep_fn", build_with_width)
        res = R.run_sweep(cfgs, prep, batch_size=8, chunk_size=4, verbose=False)
        assert res.n_configs == 4
        assert np.isfinite(res.final_train_loss).all()
        # reference run without failure injection matches
        monkeypatch.setattr(R, "build_sweep_fn", orig_build)
        ref = R.run_sweep(cfgs, prep, batch_size=8, chunk_size=2, verbose=False)
        np.testing.assert_allclose(res.final_train_loss, ref.final_train_loss,
                                   rtol=1e-5)

"""Fused decoder-update path (mmtpu/kernels/decoder_update.py +
mmtpu/train/fused.py): kernel-vs-XLA unit equivalence and whole-fit
trajectory equivalence against the dense autodiff path, on the CPU backend
(Pallas interpret mode).

The fused path must compute the SAME update law as optim.opt_update and the
same gradients as value_and_grad of the joint loss (losses.py:216-274,
simplesif.py:786) — float deltas limited to matmul accumulation order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtpu.kernels.decoder_update import (
    fused_gemm_adam_update,
    fused_gemm_sgd_update,
    xla_reference_adam,
    xla_reference_sgd,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestKernelUnit:
    def test_adam_matches_xla_reference(self, rng):
        B, D, F = 8, 12, 37  # F forces pad inside the kernel (tile 16)
        w, m = _rand(rng, D, F), 0.1 * _rand(rng, D, F)
        v = jnp.abs(0.1 * _rand(rng, D, F))
        x, gz = _rand(rng, B, D), _rand(rng, B, F)
        args = (0.01, 0.1, 0.001, 1.0)
        got = fused_gemm_adam_update(w, m, v, x, gz, *args, tile=16)
        want = xla_reference_adam(w, m, v, x, gz, *args)
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                       rtol=1e-5, atol=1e-5)

    def test_adam_flag_zero_passthrough_but_gx_live(self, rng):
        B, D, F = 4, 6, 16
        w, m = _rand(rng, D, F), _rand(rng, D, F)
        v = jnp.abs(_rand(rng, D, F))
        x, gz = _rand(rng, B, D), _rand(rng, B, F)
        w2, m2, v2, gx = fused_gemm_adam_update(
            w, m, v, x, gz, 0.5, 0.1, 0.001, 0.0, tile=16)
        np.testing.assert_array_equal(np.asarray(w2), np.asarray(w))
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(m))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gz @ w.T),
                                   rtol=1e-5, atol=1e-5)

    def test_sgd_matches_xla_reference(self, rng):
        B, D, F = 8, 12, 37
        w = _rand(rng, D, F)
        x, gz = _rand(rng, B, D), _rand(rng, B, F)
        got = fused_gemm_sgd_update(w, x, gz, 0.05, 1.0, tile=16)
        want = xla_reference_sgd(w, x, gz, 0.05, 1.0)
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                       rtol=1e-5, atol=1e-5)

    def test_vmap_matches_per_config(self, rng):
        K, B, D, F = 3, 4, 6, 32
        w, m = _rand(rng, K, D, F), 0.1 * _rand(rng, K, D, F)
        v = jnp.abs(0.1 * _rand(rng, K, D, F))
        x, gz = _rand(rng, K, B, D), _rand(rng, K, B, F)
        lr = jnp.asarray([0.01, 0.02, 0.03], jnp.float32)
        flag = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
        def one(w_, m_, v_, x_, gz_, lr_, fl_):
            return fused_gemm_adam_update(w_, m_, v_, x_, gz_, lr_,
                                          0.1, 0.001, fl_, tile=16)

        got = jax.vmap(one)(w, m, v, x, gz, lr, flag)
        for k in range(K):
            want = xla_reference_adam(w[k], m[k], v[k], x[k], gz[k],
                                      lr[k], 0.1, 0.001, flag[k])
            for g, wnt in zip([t[k] for t in got], want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                           rtol=1e-5, atol=1e-5)


def _prep(rng, pos=False):
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset

    ds = synthesize_dataset("mosi", n_train=22, n_valid=6, n_test=6,
                            vocab_size=60, embed_dim=16, audio_dim=7,
                            visual_dim=5, seq_len=6, seed=int(rng.integers(1e6)))
    kw = dict(pos_mode="shared", pos_dims=(2, 4)) if pos else dict(pos_embed_dim=0)
    prep = prepare_device_data(ds, **kw)
    data = {k: jnp.asarray(v) for k, v in prep.splits["train"].items()}
    if pos:
        # shared-table block layout [2 | 4]: activate the 4-wide block
        data["pos_mask"] = jnp.asarray(
            np.array([0, 0, 1, 1, 1, 1], np.float32))
    return prep, data


@pytest.mark.parametrize("kind,norm", [("adam", "layer_norm"),
                                       ("sgd", "batch_norm"),
                                       ("adam", None)])
def test_fit_latents_fused_matches_dense(rng, kind, norm):
    import dataclasses

    from mmtpu.models.decoder import NORM_CODES, init_decoder
    from mmtpu.train.latents import LatentFitSpec, fit_latents
    from mmtpu.train.optim import OPT_CODES

    prep, data = _prep(rng)
    dec = init_decoder(jax.random.key(3), prep.embed_dim, prep.audio_dim,
                       prep.visual_dim, unimodal=False)
    hp = {"lr": jnp.float32(5e-3), "word_loss_weight": jnp.float32(0.002),
          "opt_code": jnp.int32(OPT_CODES[kind]),
          "norm_code": jnp.int32(NORM_CODES[norm]),
          "n_epochs": jnp.int32(3)}
    spec = LatentFitSpec(n_epochs_max=3, batch_size=8, train_decoder=True,
                         unimodal=False, opt_kind=kind,
                         lazy_adam=(kind == "adam"))
    init = jnp.asarray(prep.sif_init["train"])
    run = lambda s: jax.jit(
        lambda: fit_latents(jax.random.key(0), init, dec, data,
                            jnp.asarray(prep.vocab_embeddings), hp, s))()
    e0, d0, l0 = run(spec)
    e1, d1, l1 = run(dataclasses.replace(spec, fused_dec_update=True))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=0, atol=2e-4)
    for h in d0["heads"]:
        for k in d0["heads"][h]:
            np.testing.assert_allclose(
                np.asarray(d1["heads"][h][k]), np.asarray(d0["heads"][h][k]),
                rtol=0, atol=2e-4, err_msg=f"{h}/{k}")
    for k in d0["norm"]:
        np.testing.assert_allclose(np.asarray(d1["norm"][k]),
                                   np.asarray(d0["norm"][k]),
                                   rtol=0, atol=2e-4)


def test_fit_latents_fused_respects_train_dec_gate(rng):
    """train_dec=0 must freeze the decoder exactly (heads AND norm) while
    the latents still receive gradients through the frozen forward."""
    import dataclasses

    from mmtpu.models.decoder import NORM_CODES, init_decoder
    from mmtpu.train.latents import LatentFitSpec, fit_latents
    from mmtpu.train.optim import OPT_CODES

    prep, data = _prep(rng)
    dec = init_decoder(jax.random.key(3), prep.embed_dim, prep.audio_dim,
                       prep.visual_dim, unimodal=False)
    hp = {"lr": jnp.float32(5e-3), "word_loss_weight": jnp.float32(0.002),
          "opt_code": jnp.int32(OPT_CODES["adam"]),
          "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
          "n_epochs": jnp.int32(2), "train_dec": jnp.float32(0.0)}
    spec = LatentFitSpec(n_epochs_max=2, batch_size=8, train_decoder=True,
                         unimodal=False, opt_kind="adam",
                         fused_dec_update=True)
    init = jnp.asarray(prep.sif_init["train"])
    e1, d1, _ = jax.jit(
        lambda: fit_latents(jax.random.key(0), init, dec, data,
                            jnp.asarray(prep.vocab_embeddings), hp, spec))()
    for h in dec["heads"]:
        for k in dec["heads"][h]:
            np.testing.assert_array_equal(np.asarray(d1["heads"][h][k]),
                                          np.asarray(dec["heads"][h][k]))
    assert not np.allclose(np.asarray(e1), np.asarray(init))


def test_run_sweep_fused_matches_default(rng):
    """The full production executor (vmapped chunks, both optimizer buckets,
    per-config pos blocks, senti phase) with fused_dec_update=True must score
    each config the same as the default path."""
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.sweep import run_sweep

    ds = synthesize_dataset("mosi", n_train=22, n_valid=6, n_test=6,
                            vocab_size=60, embed_dim=12, audio_dim=5,
                            visual_dim=4, seq_len=6)
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    base = {"seq_len": 6, "word_sim_metric": "angular",
            "freeze_weights": False, "n_sentiment_epochs": 4, "e2e": True,
            "sentiment_lr": 1e-2, "word_loss_weight": 0.001,
            "likelihood_weight": 0.0001, "sentiment_hidden_size": 8}
    cfgs = [dict(base, lr=1e-3, optimizer="sgd", norm="layer_norm",
                 pos_embed_dim=2, n_epochs=2, config_num=0),
            dict(base, lr=1e-4, optimizer="adam", norm="batch_norm",
                 pos_embed_dim=4, n_epochs=3, config_num=1)]
    r0 = run_sweep(cfgs, prep, batch_size=8, verbose=False)
    r1 = run_sweep(cfgs, prep, batch_size=8, verbose=False,
                   fused_dec_update=True)
    np.testing.assert_allclose(r1.final_train_loss, r0.final_train_loss,
                               rtol=2e-4, atol=2e-4)
    for k in r0.metrics:
        np.testing.assert_allclose(r1.metrics[k], r0.metrics[k],
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_sweep_cli_fused_dec_flag(tmp_path, monkeypatch):
    """`python -m mmtpu.sweep --fused_dec` reaches run_sweep and completes."""
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
        "--fused_dec",
        "--data_dir", str(tmp_path / "nodata"),
        "--out", str(tmp_path / "results"), "--name", "fusedcli",
    ])
    assert rc == 0
    summary = json.load(open(tmp_path / "results" / "fusedcli_summary.json"))
    assert summary["n_configs"] == 2


@pytest.mark.parametrize("kind", ["adam", "sgd"])
def test_fit_e2e_fused_matches_dense(rng, kind):
    import dataclasses

    from mmtpu.models.decoder import NORM_CODES, init_decoder
    from mmtpu.models.sentiment import init_sentiment
    from mmtpu.train.e2e import E2EFitSpec, fit_e2e
    from mmtpu.train.optim import OPT_CODES

    prep, data = _prep(rng, pos=True)
    p_tab = int(prep.pos_table.shape[-1])  # shared-table width (sweep layout)
    dec = init_decoder(jax.random.key(3), prep.embed_dim,
                       prep.audio_dim + p_tab, prep.visual_dim + p_tab,
                       unimodal=False)
    sen = init_sentiment(jax.random.key(5), prep.embed_dim, 32, 1)
    n = prep.splits["train"]["text_ids"].shape[0]
    labels = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    smask = jnp.asarray((rng.random(n) > 0.4).astype(np.float32))
    hp = {"lr": jnp.float32(5e-3), "word_loss_weight": jnp.float32(0.002),
          "likelihood_weight": jnp.float32(0.7),
          "opt_code": jnp.int32(OPT_CODES[kind]),
          "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
          "n_epochs": jnp.int32(3),
          "train_heads": jnp.float32(1.0)}
    spec = E2EFitSpec(n_epochs_max=3, batch_size=8, unimodal=False,
                      opt_kind=kind, lazy_adam=(kind == "adam"))
    run = lambda s: jax.jit(
        lambda: fit_e2e(jax.random.key(0),
                        jnp.asarray(prep.sif_init["train"]), dec, sen,
                        data, labels, jnp.asarray(prep.vocab_embeddings),
                        hp, s, senti_mask=smask))()
    e0, d0, s0, l0 = run(spec)
    e1, d1, s1, l1 = run(dataclasses.replace(spec, fused_dec_update=True))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=0, atol=2e-4)
    for h in d0["heads"]:
        for k in d0["heads"][h]:
            np.testing.assert_allclose(
                np.asarray(d1["heads"][h][k]), np.asarray(d0["heads"][h][k]),
                rtol=0, atol=2e-4, err_msg=f"{h}/{k}")
    for t0, t1 in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                                   rtol=0, atol=2e-4)

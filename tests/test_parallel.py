"""Mesh-integrated training: fit_latents_mesh == single-device fit_latents.

Runs on the 8 virtual CPU devices (tests/conftest.py).  The reference has no
parallelism (SURVEY.md §2 row 23); these tests pin mmtpu's new capability —
one config spanning chips via batch-axis + vocab-axis GSPMD sharding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmtpu.data.pipeline import prepare_device_data
from mmtpu.data.synthetic import synthesize_dataset
from mmtpu.models.decoder import NORM_CODES, init_decoder
from mmtpu.parallel import fit_latents_mesh, make_fit_mesh
from mmtpu.train.latents import LatentFitSpec, fit_latents, train_view
from mmtpu.train.optim import OPT_CODES


def _inputs(vocab_size=64, n_train=24, norm="batch_norm", opt="adam"):
    ds = synthesize_dataset(
        "mosi", n_train=n_train, n_valid=8, n_test=8, vocab_size=vocab_size,
        embed_dim=16, audio_dim=6, visual_dim=5,
    )
    prep = prepare_device_data(ds, pos_embed_dim=0)
    data = {k: jnp.asarray(v) for k, v in train_view(prep.splits["train"]).items()}
    vocab = jnp.asarray(prep.vocab_embeddings)
    init_e = jnp.asarray(prep.sif_init["train"])
    dec = init_decoder(jax.random.key(3), prep.embed_dim, prep.audio_dim,
                       prep.visual_dim, unimodal=False)
    hp = {"lr": jnp.float32(1e-3), "word_loss_weight": jnp.float32(0.001),
          "opt_code": jnp.int32(OPT_CODES[opt]),
          "norm_code": jnp.int32(NORM_CODES[norm]),
          "n_epochs": jnp.int32(3)}
    return data, vocab, init_e, dec, hp


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_fit_latents_mesh_matches_single_device(mesh_shape):
    """Batch-sharded + vocab-sharded training == the single-device fit, up to
    float reduction order (includes batch_norm — the batch statistics must
    reduce over the GLOBAL batch, which GSPMD guarantees)."""
    data, vocab, init_e, dec, hp = _inputs()
    spec = LatentFitSpec(n_epochs_max=3, batch_size=8, train_decoder=True,
                         unimodal=False)
    rng = jax.random.key(0)
    e_ref, dec_ref, l_ref = jax.jit(fit_latents, static_argnums=(6,))(
        rng, init_e, dec, data, vocab, hp, spec)
    mesh = make_fit_mesh(*mesh_shape)
    e_m, dec_m, l_m = fit_latents_mesh(
        mesh, rng, init_e, dec, data, vocab, hp, spec)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_ref),
                               rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(dec_m), jax.tree.leaves(dec_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_fit_latents_mesh_indivisible_axes_degrade():
    """Batch size / vocab size not divisible by the mesh axes → sharding is
    skipped for that axis, results still correct."""
    data, vocab, init_e, dec, hp = _inputs(vocab_size=63)
    spec = LatentFitSpec(n_epochs_max=2, batch_size=7, train_decoder=True,
                         unimodal=False)
    rng = jax.random.key(1)
    e_ref, _, l_ref = jax.jit(fit_latents, static_argnums=(6,))(
        rng, init_e, dec, data, vocab, hp, spec)
    mesh = make_fit_mesh(4, 2)
    e_m, _, l_m = fit_latents_mesh(mesh, rng, init_e, dec, data, vocab, hp,
                                   spec)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_ref),
                               rtol=2e-3, atol=2e-5)


def test_fit_latents_mesh_sgd_sparse_path():
    """The row-sparse SGD embedding update composes with batch sharding."""
    data, vocab, init_e, dec, hp = _inputs(opt="sgd")
    spec = LatentFitSpec(n_epochs_max=3, batch_size=8, train_decoder=True,
                         unimodal=False, opt_kind="sgd")
    rng = jax.random.key(2)
    e_ref, _, l_ref = jax.jit(fit_latents, static_argnums=(6,))(
        rng, init_e, dec, data, vocab, hp, spec)
    mesh = make_fit_mesh(8, 1)
    e_m, _, l_m = fit_latents_mesh(mesh, rng, init_e, dec, data, vocab, hp,
                                   spec)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_ref),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_fit_e2e_mesh_matches_single_device(mesh_shape):
    """The e2e joint fit (the shipped grid's default mode) sharded over the
    mesh == the single-device fit, including the semi-supervised mask and
    batch_norm's global batch statistics."""
    from mmtpu.models.sentiment import init_sentiment
    from mmtpu.parallel import fit_e2e_mesh
    from mmtpu.train.e2e import E2EFitSpec, fit_e2e

    data, vocab, init_e, dec, hp = _inputs()
    hp = dict(hp, likelihood_weight=jnp.float32(1e-4))
    n = init_e.shape[0]
    labels = jnp.asarray(
        np.random.default_rng(7).standard_normal(n).astype(np.float32))
    senti = init_sentiment(jax.random.key(9), init_e.shape[1], 6, 1)
    mask = jnp.asarray((np.arange(n) % 3 != 0).astype(np.float32))
    spec = E2EFitSpec(n_epochs_max=3, batch_size=8, unimodal=False)
    rng = jax.random.key(4)

    e_ref, dec_ref, sen_ref, l_ref = jax.jit(fit_e2e, static_argnums=(8,))(
        rng, init_e, dec, senti, data, labels, vocab, hp, spec, mask)
    mesh = make_fit_mesh(*mesh_shape)
    e_m, dec_m, sen_m, l_m = fit_e2e_mesh(
        mesh, rng, init_e, dec, senti, data, labels, vocab, hp, spec, mask)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_ref),
                               rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(sen_m), jax.tree.leaves(sen_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(dec_m), jax.tree.leaves(dec_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_fit_latents_mesh_adam_permuted_path():
    """The permuted-Adam static path (moment tables permuted per epoch,
    dense grad via update-slice) composes with batch sharding."""
    data, vocab, init_e, dec, hp = _inputs(opt="adam")
    spec = LatentFitSpec(n_epochs_max=3, batch_size=8, train_decoder=True,
                         unimodal=False, opt_kind="adam")
    rng = jax.random.key(5)
    e_ref, _, l_ref = jax.jit(fit_latents, static_argnums=(6,))(
        rng, init_e, dec, data, vocab, hp, spec)
    mesh = make_fit_mesh(8, 1)
    e_m, _, l_m = fit_latents_mesh(mesh, rng, init_e, dec, data, vocab, hp,
                                   spec)
    np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_ref),
                               rtol=2e-3, atol=2e-5)

"""Experiment runner — the TPU-native equivalent of ``simplesif.py main()``.

Orchestrates the 3-phase pipeline (``simplesif.py:240-916``):
1. SIF cold-start embeddings (via :mod:`mmtpu.data.pipeline`);
2. latent optimization — likelihood-only (non-e2e, ``simplesif.py:542-624``)
   or joint e2e (``simplesif.py:625-912``);
3. downstream sentiment/trait evaluation (``sentiment_model.py:165-265``),
   before/after, with artifacts in the reference's directory contract.

Everything numeric runs as jitted scan programs; this module is thin glue.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmtpu.config import ExperimentConfig
from mmtpu.data.pipeline import PreparedData, prepare_device_data
from mmtpu.data.registry import load_dataset
from mmtpu.eval.report import full_loss, iemocap_loss, pom_loss
from mmtpu.io.artifacts import ArtifactStore
from mmtpu.models.decoder import NORM_CODES, init_decoder
from mmtpu.models.sentiment import apply_sentiment, init_sentiment
from mmtpu.train.e2e import E2EFitSpec, fit_e2e
from mmtpu.train.latents import LatentFitSpec, fit_latents, train_view
from mmtpu.train.optim import OPT_CODES
from mmtpu.train.sentiment import SentimentFitSpec, fit_sentiment


# jitted entry points (specs are hashable frozen dataclasses → static)
_fit_latents = jax.jit(fit_latents, static_argnums=(6,))
_fit_e2e = jax.jit(fit_e2e, static_argnums=(8,))
_fit_sentiment = jax.jit(fit_sentiment, static_argnums=(7,))


def build_hp(cfg: ExperimentConfig) -> Dict[str, jnp.ndarray]:
    """Runtime hyperparameter scalars consumed by the jitted programs."""
    return {
        "lr": jnp.float32(cfg.lr),
        "word_loss_weight": jnp.float32(cfg.word_loss_weight),
        "likelihood_weight": jnp.float32(cfg.likelihood_weight),
        "opt_code": jnp.int32(OPT_CODES[cfg.optimizer]),
        "norm_code": jnp.int32(NORM_CODES[cfg.norm]),
        "n_epochs": jnp.int32(cfg.n_epochs),
    }


def prepare(cfg: ExperimentConfig, data_dir: str = ".") -> PreparedData:
    dataset = load_dataset(cfg.dataset, data_dir=data_dir, emotion=cfg.emotion)
    return prepare_device_data(
        dataset,
        word_sim_metric=cfg.word_sim_metric,
        pos_embed_dim=cfg.pos_embed_dim,
        pos_mode="baked",
        pos_bug_parity=cfg.parity,
        # parity mode keeps the raw per-timestep Gaussian computation
        suff_stats=not cfg.parity,
    )


def semi_sup_mask(
    dataset: str,
    semi_sup_idxes: Optional[str],
    n_train: int,
    seed: int = 0,
    data_dir: str = ".",
) -> Optional[np.ndarray]:
    """0/1 labeled mask from ``<dataset>_subset_idxes.h5`` (simplesif.py:496-501);
    synthesizes a deterministic subset if the file is absent."""
    if semi_sup_idxes is None:
        return None
    import os

    mask = np.zeros(n_train, np.float32)
    path = os.path.join(data_dir, f"{dataset}_subset_idxes.h5")
    if os.path.isfile(path):
        import h5py

        with h5py.File(path, "r") as f:
            idxes = f[semi_sup_idxes][:]
    else:
        frac = float(semi_sup_idxes)
        rng = np.random.default_rng(seed)
        idxes = rng.choice(n_train, size=int(round(frac * n_train)), replace=False)
    mask[idxes] = 1.0
    return mask


def load_semi_sup_mask(
    cfg: ExperimentConfig, n_train: int, data_dir: str = "."
) -> Optional[np.ndarray]:
    return semi_sup_mask(
        cfg.dataset, cfg.semi_sup_idxes, n_train, seed=cfg.seed, data_dir=data_dir
    )


def _sentiment_phase(
    cfg: ExperimentConfig,
    prep: PreparedData,
    latents: Dict[str, jnp.ndarray],
    store: Optional[ArtifactStore],
    which: str,
    rng: jax.Array,
    train_idxes: Optional[np.ndarray] = None,
    verbose: bool = True,
) -> Dict:
    """Equivalent of ``train_sentiment_for_latents`` (sentiment_model.py:165-265):
    eval-before sandwich, train with optional early stopping, eval-after."""
    train_lat, valid_lat, test_lat = (
        latents["train"], latents["valid"], latents["test"]
    )
    y_train = jnp.asarray(prep.labels["train"])
    y_valid = jnp.asarray(prep.labels["valid"])
    y_test = jnp.asarray(prep.labels["test"])
    if train_idxes is not None:  # non-e2e semi-sup subsets rows (sentiment_model.py:189-194)
        sel = np.nonzero(train_idxes)[0]
        train_lat = train_lat[sel]
        y_train = y_train[sel]

    n_out = 1 if y_train.ndim == 1 else y_train.shape[-1]
    k_init, k_fit = jax.random.split(rng)
    params = init_sentiment(
        k_init, prep.embed_dim, cfg.sentiment_hidden_size, n_out
    )

    def report(pred, y):
        if cfg.dataset == "mosi":
            return full_loss(np.asarray(pred), np.asarray(y), verbose=verbose)
        if cfg.dataset == "iemocap":
            return iemocap_loss(np.asarray(pred), np.asarray(y), verbose=verbose)
        return pom_loss(np.asarray(pred), np.asarray(y), verbose=verbose)

    before = report(apply_sentiment(params, test_lat), y_test)
    if store is not None:
        store.save_results(which, "before", before)

    shp = {
        "lr": jnp.float32(cfg.sentiment_lr),
        "lr_decay": jnp.float32(cfg.lr_decay),
        "n_epochs": jnp.int32(cfg.n_sentiment_epochs),
    }
    sspec = SentimentFitSpec(
        n_epochs_max=cfg.n_sentiment_epochs, early_stopping=cfg.early_stopping
    )
    last, best, tr_losses, va_losses = _fit_sentiment(
        k_fit, params, train_lat, y_train, valid_lat, y_valid, shp, sspec
    )
    # parity: final eval uses the LAST params (see mmtpu.train.sentiment note)
    after = report(apply_sentiment(last, test_lat), y_test)
    if store is not None:
        store.save_results(which, "after", after)
        store.save_sentiment_losses(which, np.asarray(tr_losses), np.asarray(va_losses))
        store.save_sentiment_model(which, last)
    return {"before": before, "after": after}


def run_experiment(
    cfg: ExperimentConfig,
    data_dir: str = ".",
    out_root: str = "model_saves",
    prep: Optional[PreparedData] = None,
    run_idx: int = 0,
    save_artifacts: bool = True,
    time_test: bool = False,
    validation_curve: bool = False,
    verbose: bool = True,
    mesh=None,
    resume_dir: Optional[str] = None,
    lazy_adam: bool = False,
) -> Dict:
    """Run one full experiment for one config.  Returns a results dict.

    ``validation_curve=True`` reproduces the reference's recursive
    validation-during-training (a full frozen-decoder refit of the valid
    split every 80 epochs — simplesif.py:146-159); expensive, off by default.

    ``mesh`` (a jax Mesh with "data"/"vocab" axes — see
    ``mmtpu.parallel.make_fit_mesh``) spans ONE config across chips: batch
    rows shard over "data" with gradient psum, the vocab table over "vocab"
    (new capability vs the single-device reference, SURVEY.md §2 row 23).

    ``resume_dir`` makes the (non-e2e) training fit epoch-segment resumable
    via ``mmtpu.train.chunked.fit_latents_checkpointed`` — a killed run
    restarted with the same dir continues where it stopped.

    ``lazy_adam=True`` selects the sweep executor's epoch-level lazy-Adam
    fast path (mmtpu/train/optim.py) instead of the torch-exact dense Adam
    default — used by ``--top_k_artifacts`` re-runs so a config is re-scored
    on the same optimizer path the sweep selected it with.
    """
    if prep is None:
        prep = prepare(cfg, data_dir)
    if mesh is not None and validation_curve:
        raise ValueError("--mesh does not support --validation_curve "
                         "(the mesh fits are no-validation programs)")
    if resume_dir is not None and cfg.e2e:
        raise ValueError("--resume_dir supports non-e2e fits only "
                         "(pass --e2e n or set e2e: false in the config)")
    if resume_dir is not None and mesh is not None:
        raise ValueError("--resume_dir and --mesh are mutually exclusive")

    store = None
    if save_artifacts:
        store = ArtifactStore(
            out_root, cfg.config_name or "mmtpu", cfg.config_num, run_idx
        )
        store.save_config(cfg.to_dict())
        store.save_embeddings(
            "pre",
            np.concatenate(
                [prep.sif_init[s] for s in ("train", "valid", "test")], axis=0
            ),
        )

    key = jax.random.key(cfg.seed + run_idx)
    k_dec, k_e2e, k_fit, k_val, k_test, k_sent = jax.random.split(key, 6)

    decoder = init_decoder(
        k_dec,
        prep.embed_dim,
        prep.audio_dim,
        prep.visual_dim,
        unimodal=cfg.unimodal,
        text_dim=prep.text_gauss_dim,
    )
    hp = build_hp(cfg)
    vocab = jnp.asarray(prep.vocab_embeddings)

    partition_fn = None
    if cfg.use_pallas and cfg.word_sim_metric == "angular":
        from mmtpu.kernels.angular import angular_partition_pallas

        partition_fn = angular_partition_pallas

    t_train_start = time.time()
    semi_mask = load_semi_sup_mask(cfg, prep.labels["train"].shape[0], data_dir)
    valid_curve = None

    if cfg.e2e:
        n_out = 1 if prep.labels["train"].ndim == 1 else prep.labels["train"].shape[-1]
        senti0 = init_sentiment(
            k_e2e, prep.embed_dim, cfg.sentiment_hidden_size, n_out
        )
        espec = E2EFitSpec(
            n_epochs_max=cfg.n_epochs,
            batch_size=cfg.batch_size,
            unimodal=cfg.unimodal,
            word_metric=cfg.word_sim_metric,
            valid_every=80 if validation_curve else 0,  # valid_niter*8
            partition_fn=partition_fn,
            opt_kind=cfg.optimizer,
            lazy_adam=lazy_adam,
        )
        # e2e freeze_weights: heads frozen, norm still trains (see
        # mmtpu.train.e2e — simplesif.py:689-691 vs models.py:170-178)
        e2e_hp = dict(hp, train_heads=jnp.float32(not cfg.freeze_weights))
        if mesh is not None:
            from mmtpu.parallel import fit_e2e_mesh

            out = fit_e2e_mesh(
                mesh, k_fit,
                jnp.asarray(prep.sif_init["train"]), decoder, senti0,
                train_view(prep.splits["train"]),
                jnp.asarray(prep.labels["train"]), vocab, e2e_hp, espec,
                senti_mask=None if semi_mask is None else jnp.asarray(semi_mask),
            )
        else:
            out = _fit_e2e(
                k_fit,
                jnp.asarray(prep.sif_init["train"]),
                decoder,
                senti0,
                train_view(prep.splits["train"]),
                jnp.asarray(prep.labels["train"]),
                vocab,
                e2e_hp,
                espec,
                senti_mask=None if semi_mask is None else jnp.asarray(semi_mask),
                validation=(
                    (jnp.asarray(prep.sif_init["valid"]),
                     train_view(prep.splits["valid"]))
                    if validation_curve else None
                ),
            )
        if validation_curve:
            train_embed, decoder, _, train_losses, valid_curve = out
        else:
            train_embed, decoder, _, train_losses = out
    else:
        spec = LatentFitSpec(
            n_epochs_max=cfg.n_epochs,
            batch_size=cfg.batch_size,
            lazy_adam=lazy_adam,
            train_decoder=not cfg.freeze_weights,
            unimodal=cfg.unimodal,
            word_metric=cfg.word_sim_metric,
            valid_every=80 if validation_curve else 0,  # valid_niter*8
            partition_fn=partition_fn,
            opt_kind=cfg.optimizer,
        )
        valid_curve = None
        if validation_curve:
            train_embed, decoder, train_losses, valid_curve = _fit_latents(
                k_fit,
                jnp.asarray(prep.sif_init["train"]),
                decoder,
                train_view(prep.splits["train"]),
                vocab,
                hp,
                spec,
                (jnp.asarray(prep.sif_init["valid"]), train_view(prep.splits["valid"])),
            )
        elif mesh is not None:
            from mmtpu.parallel import fit_latents_mesh

            train_embed, decoder, train_losses = fit_latents_mesh(
                mesh, k_fit, jnp.asarray(prep.sif_init["train"]), decoder,
                train_view(prep.splits["train"]), vocab, hp, spec,
            )
        elif resume_dir is not None:
            from mmtpu.io.checkpoint import Checkpointer
            from mmtpu.train.chunked import fit_latents_checkpointed

            train_embed, decoder, train_losses = fit_latents_checkpointed(
                k_fit, jnp.asarray(prep.sif_init["train"]), decoder,
                train_view(prep.splits["train"]), vocab, hp, spec,
                checkpointer=Checkpointer(resume_dir), verbose=verbose,
            )
        else:
            train_embed, decoder, train_losses = _fit_latents(
                k_fit,
                jnp.asarray(prep.sif_init["train"]),
                decoder,
                train_view(prep.splits["train"]),
                vocab,
                hp,
                spec,
            )

    # inference = optimization with frozen decoder (simplesif.py:607-610);
    # valid/test loaders are unshuffled at batch_size*8 (simplesif.py:458-459)
    infer_spec = LatentFitSpec(
        n_epochs_max=cfg.n_epochs,
        batch_size=cfg.batch_size * 8,
        lazy_adam=lazy_adam,
        train_decoder=False,
        unimodal=cfg.unimodal,
        word_metric=cfg.word_sim_metric,
        shuffle=False,
        partition_fn=partition_fn,
        opt_kind=cfg.optimizer,
    )
    if mesh is not None:
        from mmtpu.parallel import fit_latents_mesh

        _infer = lambda k, s, e: fit_latents_mesh(
            mesh, k, jnp.asarray(e), decoder,
            train_view(prep.splits[s]), vocab, hp, infer_spec)
    else:
        _infer = lambda k, s, e: _fit_latents(
            k, jnp.asarray(e), decoder,
            train_view(prep.splits[s]), vocab, hp, infer_spec)
    valid_embed, _, valid_losses = _infer(
        k_val, "valid", prep.sif_init["valid"])
    test_embed, _, test_losses = _infer(
        k_test, "test", prep.sif_init["test"])
    jax.block_until_ready(test_embed)
    train_time = time.time() - t_train_start

    if store is not None:
        store.save_losses("embed_loss", np.asarray(train_losses))
        if validation_curve and valid_curve is not None:
            vc = np.asarray(valid_curve)
            store.save_losses("embed_valid_loss", vc[np.isfinite(vc)])
        else:
            store.save_losses("embed_valid_loss", np.asarray(valid_losses))
        store.save_losses("embed_test_loss", np.asarray(test_losses))
        store.save_embeddings(
            "post",
            np.concatenate(
                [np.asarray(train_embed), np.asarray(valid_embed),
                 np.asarray(test_embed)], axis=0,
            ),
        )

    final_loss = float(np.asarray(train_losses)[cfg.n_epochs - 1])
    diverged = not (
        np.isfinite(final_loss)
        and np.isfinite(np.asarray(train_embed)).all()
    )
    if diverged and verbose:
        # the reference sys.exit()s the whole process on infinite losses
        # (losses.py:258-264); mmtpu records the divergence and continues
        print(f"[mmtpu] WARNING: config {cfg.config_num} diverged "
              f"(final_loss={final_loss})")
    results: Dict = {
        "config_num": cfg.config_num,
        "train_time_s": train_time,
        "final_train_loss": final_loss,
        "diverged": diverged,
    }

    if time_test:
        results["closed_form"] = _time_closed_form(cfg, prep, decoder, verbose)

    latents = {"train": train_embed, "valid": valid_embed, "test": test_embed}
    # semi-sup subsetting applies in BOTH modes: the reference's e2e branch
    # also passes sentiment_train_idxes to the downstream phase
    # (simplesif.py:910-912, sentiment_model.py:189-194)
    results["sentiment"] = _sentiment_phase(
        cfg, prep, latents, store, "post", k_sent,
        train_idxes=semi_mask,
        verbose=verbose,
    )
    return results


def _time_closed_form(cfg, prep, decoder, verbose=True) -> Dict:
    """The ``--time_test`` harness (simplesif.py:808-889): closed-form latent
    estimation from the trained decoder, wall-clock timed."""
    from mmtpu.ops.closed_form import closed_form_latents

    d = prep.splits["test"]
    heads = decoder["heads"]
    # assemble per-head data streams like the reference's explicit cats
    # (simplesif.py:820-842); segment order matches the decoder layout
    def cat(*parts):
        return jnp.concatenate(parts, axis=-1)

    tg = jnp.asarray(d["text_gauss"])
    au = jnp.asarray(d["audio"])
    vi = jnp.asarray(d["visual"])
    data = {"audio": au, "visual": vi}
    if not cfg.unimodal:
        data.update({
            "audiovisual": cat(au, vi),
            "textaudio": cat(tg, au),
            "textvisual": cat(tg, vi),
            "textaudiovisual": cat(tg, au, vi),
        })
    heads_used = {k: heads[k] for k in data}
    sw = jnp.asarray(d["text_weights"])
    se = jnp.asarray(prep.vocab_embeddings)[jnp.asarray(d["text_ids"])]

    fn = jax.jit(lambda dd, hh, w, s: closed_form_latents(dd, hh, w, s))
    lat = fn(data, heads_used, sw, se)
    jax.block_until_ready(lat)  # warm compile, like a serving steady state
    t0 = time.time()
    lat = fn(data, heads_used, sw, se)
    jax.block_until_ready(lat)
    dt = time.time() - t0
    if verbose:
        print("time taken:", dt)
    return {"latency_s": dt, "n_utterances": int(lat.shape[0])}

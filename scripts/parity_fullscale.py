"""Full-scale accuracy parity: reference (torch, unmodified) vs mmtpu.

Drives the reference's own training code (``optimize_latents``
simplesif.py:49-162, ``train_sentiment`` sentiment_model.py:76-163, and the
dataset metric fns ``full_loss``/``pom_loss``/``iemocap_loss``
losses.py:276-366, imported via sys.path from $MMTPU_REFERENCE, default
/root/reference) and mmtpu side by side on IDENTICAL full-size synthetic
data with:

- ``--dataset mosi`` (default): 1284/229/686 utterances, vocab 3016x300,
  audio 74, visual 47, seq 20;
- ``--dataset pom``: 600/100/203 speakers, vocab 9206x300, audio/visual 43,
  20-step aligned text + token rows at REAL length 1357
  (pom_test_ids.npy geometry), 17 trait labels → per-trait
  MAE/corr/mult_acc/F1 (losses.py:342-366);
- ``--dataset iemocap``: MOSI-scale per-emotion split, 2-class one-hot
  labels → argmax accuracy + weighted F1 (losses.py:317-340).

Both sides consume:

- identical normalized arrays, masks, SIF-init embeddings (built once by
  mmtpu's parity-mode pipeline, fed to both sides);
- matched decoder + sentiment-MLP initial weights (torch init copied into
  the mmtpu pytrees);
- shuffling disabled on both sides (the only way to compare trajectories —
  torch DataLoader order and jax PRNG permutations cannot be aligned);
- float32 matmuls on the jax side (``jax_default_matmul_precision=highest``).

For each config it records the final embedding-fit train loss, the max
absolute latent delta, and the downstream test metrics (MAE / corr /
mult_acc / F1 / binary acc) from BOTH implementations, writing
PARITY_FULLSCALE.json + a markdown table to stdout.

Usage::

    python scripts/parity_fullscale.py [--n_epochs 10] [--configs 4]
        [--senti_epochs 400] [--out PARITY_FULLSCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REF = os.environ.get("MMTPU_REFERENCE", "/root/reference")
# running as `python scripts/parity_fullscale.py` puts scripts/ (not the repo
# root) on sys.path — add the root so `import mmtpu` resolves
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

CONFIGS = [
    {"optimizer": "sgd", "norm": "layer_norm"},
    {"optimizer": "adam", "norm": "layer_norm"},
    {"optimizer": "sgd", "norm": "batch_norm"},
    {"optimizer": "adam", "norm": "batch_norm"},
]

BASE = {
    "unimodal": False,
    "lr": 1e-4,
    "word_loss_weight": 0.001,
    "word_sim_metric": "angular",
    "freeze_weights": False,
    "early_stopping": False,
    "sentiment_lr": 1e-2,
    "lr_decay": 0.5,
    "sentiment_hidden_size": 100,
    "batch_size": 64,
}


def _import_reference():
    """Import the reference modules unmodified (stubbing the absent
    analyze_embeddings module, simplesif.py:30 — SURVEY.md §2 row 20)."""
    stub = types.ModuleType("analyze_embeddings")
    stub.get_closest_words = lambda *a, **k: []
    sys.modules.setdefault("analyze_embeddings", stub)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import losses as ref_losses  # noqa
    import models as ref_models  # noqa
    import sentiment_model as ref_sentiment  # noqa
    import simplesif as ref_driver  # noqa
    import utils as ref_utils  # noqa

    return ref_driver, ref_models, ref_losses, ref_sentiment, ref_utils


def build_data(dataset: str = "mosi", seed: int = 0, smoke: bool = False):
    """Full-size synthetic data, prepared once; both sides consume the same
    normalized numpy arrays and the same SIF-init embeddings."""
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset

    if smoke:  # tiny shapes to validate the harness itself
        ds = synthesize_dataset(
            dataset, n_train=40, n_valid=12, n_test=20,
            vocab_size=64, embed_dim=16, audio_dim=6, visual_dim=5,
            seed=seed, text_len=37 if dataset != "mosi" else 0,
        )
    elif dataset == "pom":
        # real POM geometry: pom_test_ids.npy is (203, 1357), vocab 9206
        # (SURVEY.md §2 row 3; scripts/bench_pom_fullscale.py)
        ds = synthesize_dataset(
            "pom", n_train=600, n_valid=100, n_test=203,
            vocab_size=9206, embed_dim=300, audio_dim=43, visual_dim=43,
            text_len=1357, seed=seed,
        )
    elif dataset == "iemocap":
        ds = synthesize_dataset(
            "iemocap", n_train=1284, n_valid=229, n_test=686,
            vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
            seed=seed,
        )
    else:
        ds = synthesize_dataset(
            "mosi", n_train=1284, n_valid=229, n_test=686,
            vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
            seed=seed,
        )
    # suff_stats=True is the mmtpu production path (mathematically exact —
    # equivalence-tested in tests/test_runner.py); raw streams for the torch
    # side come from the same dict (text_gauss/audio/visual + masks)
    prep = prepare_device_data(ds, pos_embed_dim=0, suff_stats=True)
    return ds, prep


def _torch_decoder(cfg, seed, D, A, V, ref_models):
    import torch

    torch.manual_seed(seed)
    return ref_models.AudioVisualGeneratorMultimodal(
        D, A, V, norm=cfg["norm"], frozen_weights=cfg["freeze_weights"],
        unimodal=cfg["unimodal"],
    )


def _decoder_to_jax(gen_model, D):
    """Copy the torch decoder's init into the mmtpu pytree (weights stored
    (in, out) — CLAUDE.md convention)."""
    import jax.numpy as jnp

    heads = {}
    for name, mod in gen_model.embed2out.items():
        heads[name] = {
            "w_mu": jnp.asarray(mod["mu"].weight.detach().numpy().T.copy()),
            "b_mu": jnp.asarray(mod["mu"].bias.detach().numpy().copy()),
            "w_log_sigma": jnp.asarray(
                mod["log_sigma"].weight.detach().numpy().T.copy()),
            "b_log_sigma": jnp.asarray(
                mod["log_sigma"].bias.detach().numpy().copy()),
        }
    norm = gen_model.norm
    scale = (jnp.asarray(norm.weight.detach().numpy().copy())
             if norm is not None else jnp.ones((D,)))
    bias = (jnp.asarray(norm.bias.detach().numpy().copy())
            if norm is not None else jnp.zeros((D,)))
    return {"heads": heads, "norm": {"scale": scale, "bias": bias}}


def _senti_to_jax(sm):
    import jax.numpy as jnp

    return {
        "w1": jnp.asarray(sm.hidden1.weight.detach().numpy().T.copy()),
        "b1": jnp.asarray(sm.hidden1.bias.detach().numpy().copy()),
        "w2": jnp.asarray(sm.out.weight.detach().numpy().T.copy()),
        "b2": jnp.asarray(sm.out.bias.detach().numpy().copy()),
    }


def _keep_metrics(results):
    """Scalar + per-trait-list metric values (drop confusion matrices /
    nested classification reports)."""
    out = {}
    for k, v in results.items():
        if isinstance(v, (int, float)):
            out[k] = v
        elif (isinstance(v, list) and v
              and all(isinstance(x, (int, float)) for x in v)
              and k != "confusion_matrix"):
            out[k] = [float(x) for x in v]
    return out


def run_reference(cfg, prep, gen_model, senti_model, n_epochs, senti_epochs,
                  ref):
    """The reference 3-phase pipeline, driven through its own functions with
    shuffling off."""
    import torch
    from torch.utils.data import DataLoader

    ref_driver, ref_models, ref_losses, ref_sentiment, ref_utils = ref
    device = torch.device("cpu")
    we_t = torch.tensor(np.asarray(prep.vocab_embeddings))
    is_mosi = prep.name == "mosi"

    def word_fn(latents, w, s, m):
        # the closure simplesif.py:529-537 binds (angular2, a=1e-3)
        return ref_driver.get_word_log_prob_angular2(latents, we_t, w, s, m, 1e-3)

    def loader(split, bsz, n_rows):
        d = prep.splits[split]
        ids = torch.tensor(np.asarray(d["text_ids"]), dtype=torch.long)
        text = we_t[ids]
        masks = {
            "text": torch.tensor(
                np.broadcast_to(
                    np.asarray(d["text_mask"])[:, :, None], text.shape
                ).copy()),
            "covarep": torch.tensor(np.asarray(d["audio_mask"])),
            "facet": torch.tensor(np.asarray(d["visual_mask"])),
        }
        if is_mosi:
            data = ref_utils.MMData(
                text, torch.tensor(np.asarray(d["audio"])),
                torch.tensor(np.asarray(d["visual"])), masks,
                torch.tensor(np.asarray(d["text_weights"])), device,
            )
        else:
            # POM/IEMOCAP: word-prob stream = gathered token rows; Gaussian
            # text stream = 20-step ALIGNED embeddings (simplesif.py:332-344,
            # MMDataExtra utils.py:235-251)
            aligned = np.asarray(d["text_gauss"])
            # NB must be NUMPY: MMDataExtra's ta_mask is only assigned inside
            # `if not torch.is_tensor(masks['text_align'])` (utils.py:244-246)
            # — passing a tensor hits an UnboundLocalError in the reference
            masks["text_align"] = np.broadcast_to(
                np.asarray(d["text_gauss_mask"])[:, :, None], aligned.shape
            ).copy()
            data = ref_utils.MMDataExtra(
                text, torch.tensor(np.asarray(d["audio"])),
                torch.tensor(np.asarray(d["visual"])), masks,
                torch.tensor(np.asarray(d["text_weights"])),
                torch.tensor(aligned), device,
            )
        return DataLoader(data, batch_size=bsz, shuffle=False)

    args = dict(BASE, **cfg, n_epochs=n_epochs,
                n_sentiment_epochs=senti_epochs)
    bsz = args["batch_size"]
    t0 = time.time()
    tr_loader = loader("train", bsz, None)
    va_loader = loader("valid", bsz * 8, None)
    te_loader = loader("test", bsz * 8, None)

    train_embed, (losses, _) = ref_driver.optimize_latents(
        args, True, gen_model, np.asarray(prep.sif_init["train"]),
        tr_loader, n_epochs, args["lr"], word_fn, device, verbose=False)
    valid_embed, _ = ref_driver.optimize_latents(
        args, False, gen_model, np.asarray(prep.sif_init["valid"]),
        va_loader, n_epochs, args["lr"], word_fn, device, verbose=False)
    test_embed, _ = ref_driver.optimize_latents(
        args, False, gen_model, np.asarray(prep.sif_init["test"]),
        te_loader, n_epochs, args["lr"], word_fn, device, verbose=False)
    fit_time = time.time() - t0

    # --- downstream sentiment (reference train_sentiment, shuffle off) ---
    t0 = time.time()
    y = {s: torch.tensor(np.asarray(prep.labels[s])) for s in
         ("train", "valid", "test")}
    s_tr = DataLoader(ref_sentiment.SentimentData(y["train"], device),
                      batch_size=32, shuffle=False)
    s_va = DataLoader(ref_sentiment.SentimentData(y["valid"], device),
                      batch_size=32, shuffle=False)
    ref_sentiment.train_sentiment(
        args, senti_model, s_tr, train_embed, s_va, valid_embed,
        model_loader=None, verbose=False, model_save_path=None)
    senti_model.eval()
    with torch.no_grad():
        pred = senti_model(test_embed).numpy()
    metric_fn = {"mosi": ref_losses.full_loss, "pom": ref_losses.pom_loss,
                 "iemocap": ref_losses.iemocap_loss}[prep.name]
    metrics = metric_fn(pred, np.asarray(prep.labels["test"]))
    senti_time = time.time() - t0

    return {
        "final_train_loss": float(losses[-1]),
        "latents": {
            "train": train_embed.detach().numpy(),
            "valid": valid_embed.detach().numpy(),
            "test": test_embed.detach().numpy(),
        },
        "metrics": _keep_metrics(metrics),
        "fit_time_s": fit_time,
        "senti_time_s": senti_time,
    }


def run_mmtpu(cfg, prep, dec_jax, senti_jax, n_epochs, senti_epochs):
    """mmtpu's production path (suff-stats fits, static opt kind), shuffle
    off, matched inits."""
    import jax
    import jax.numpy as jnp

    from mmtpu.eval.report import full_loss, iemocap_loss, pom_loss
    from mmtpu.models.decoder import NORM_CODES
    from mmtpu.models.sentiment import apply_sentiment
    from mmtpu.train.latents import LatentFitSpec, fit_latents, train_view
    from mmtpu.train.optim import OPT_CODES
    from mmtpu.train.sentiment import SentimentFitSpec, fit_sentiment

    hp = {
        "lr": jnp.float32(BASE["lr"]),
        "word_loss_weight": jnp.float32(BASE["word_loss_weight"]),
        "opt_code": jnp.int32(OPT_CODES[cfg["optimizer"]]),
        "norm_code": jnp.int32(NORM_CODES[cfg["norm"]]),
        "n_epochs": jnp.int32(n_epochs),
    }
    spec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=BASE["batch_size"],
        train_decoder=True, unimodal=False, shuffle=False,
        opt_kind=cfg["optimizer"],
    )
    ispec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=BASE["batch_size"] * 8,
        train_decoder=False, unimodal=False, shuffle=False,
        opt_kind=cfg["optimizer"],
    )
    vocab = jnp.asarray(prep.vocab_embeddings)
    fit = jax.jit(fit_latents, static_argnums=(6,))
    key = jax.random.key(0)

    t0 = time.time()
    tr_e, dec, losses = fit(
        key, jnp.asarray(prep.sif_init["train"]), dec_jax,
        train_view(prep.splits["train"]), vocab, hp, spec)
    va_e, _, _ = fit(key, jnp.asarray(prep.sif_init["valid"]), dec,
                     train_view(prep.splits["valid"]), vocab, hp, ispec)
    te_e, _, _ = fit(key, jnp.asarray(prep.sif_init["test"]), dec,
                     train_view(prep.splits["test"]), vocab, hp, ispec)
    tr_e, va_e, te_e = (np.asarray(tr_e), np.asarray(va_e), np.asarray(te_e))
    losses = np.asarray(losses)
    fit_time = time.time() - t0

    t0 = time.time()
    shp = {"lr": jnp.float32(BASE["sentiment_lr"]),
           "lr_decay": jnp.float32(BASE["lr_decay"]),
           "n_epochs": jnp.int32(senti_epochs)}
    sspec = SentimentFitSpec(n_epochs_max=senti_epochs, early_stopping=False,
                             shuffle=False)
    last, _, _, _ = jax.jit(fit_sentiment, static_argnums=(7,))(
        key, senti_jax, jnp.asarray(tr_e), jnp.asarray(prep.labels["train"]),
        jnp.asarray(va_e), jnp.asarray(prep.labels["valid"]), shp, sspec)
    pred = np.asarray(apply_sentiment(last, jnp.asarray(te_e)))
    metric_fn = {"mosi": full_loss, "pom": pom_loss,
                 "iemocap": iemocap_loss}[prep.name]
    metrics = metric_fn(pred, np.asarray(prep.labels["test"]), verbose=False)
    senti_time = time.time() - t0

    return {
        "final_train_loss": float(losses[-1]),
        "latents": {"train": tr_e, "valid": va_e, "test": te_e},
        "metrics": _keep_metrics(metrics),
        "fit_time_s": fit_time,
        "senti_time_s": senti_time,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["mosi", "pom", "iemocap"],
                   default="mosi")
    p.add_argument("--n_epochs", type=int, default=10)
    p.add_argument("--senti_epochs", type=int, default=400)
    p.add_argument("--configs", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes — validates the harness, not parity")
    p.add_argument("--cpu", action="store_true",
                   help="force the mmtpu side onto the CPU backend (e.g. "
                        "when the TPU relay is down; accuracy parity is "
                        "backend-independent at --precision highest)")
    p.add_argument("--only", help="comma-separated config indices to run")
    p.add_argument("--append", action="store_true",
                   help="append to an existing --out instead of overwriting")
    p.add_argument("--out", default=None,
                   help="default: PARITY_FULLSCALE.json (mosi) / "
                        "PARITY_FULLSCALE_<dataset>.json")
    args = p.parse_args(argv)
    if args.out is None:
        args.out = ("PARITY_FULLSCALE.json" if args.dataset == "mosi"
                    else f"PARITY_FULLSCALE_{args.dataset}.json")

    import jax

    if args.cpu:
        # must run before any backend init; the axon sitecustomize ignores
        # JAX_PLATFORMS (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        from mmtpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    ref = _import_reference()
    import torch

    BASE["dataset"] = args.dataset
    ds, prep = build_data(args.dataset, args.seed, smoke=args.smoke)
    D, A, V = prep.embed_dim, prep.audio_dim, prep.visual_dim
    labels = np.asarray(prep.labels["train"])
    n_out = 1 if labels.ndim == 1 else labels.shape[-1]  # sentiment_model.py:181-185

    rows = []
    if args.append and os.path.isfile(args.out):
        rows = json.load(open(args.out))["rows"]
    indices = (
        [int(i) for i in args.only.split(",")] if args.only
        else list(range(min(args.configs, len(CONFIGS))))
    )
    for ci in indices:
        cfg = CONFIGS[ci]
        cfg_full = dict(BASE, **cfg)
        print(f"[parity] config {ci}: {cfg['optimizer']} + {cfg['norm']}",
              flush=True)
        gen_model = _torch_decoder(cfg_full, 100 + ci, D, A, V, ref[1])
        torch.manual_seed(200 + ci)
        senti_model = ref[3].SentimentModel(
            D, BASE["sentiment_hidden_size"], n_out)
        dec_jax = _decoder_to_jax(gen_model, D)
        senti_jax = _senti_to_jax(senti_model)

        got = run_mmtpu(cfg, prep, dec_jax, senti_jax, args.n_epochs,
                        args.senti_epochs)
        print(f"[parity]   mmtpu: loss={got['final_train_loss']:.4f} "
              f"({got['fit_time_s']:.1f}s fit, {got['senti_time_s']:.1f}s "
              f"senti) metrics={got['metrics']}", flush=True)
        try:
            want = run_reference(cfg_full, prep, gen_model, senti_model,
                                 args.n_epochs, args.senti_epochs, ref)
            print(f"[parity]   reference: loss={want['final_train_loss']:.4f} "
                  f"({want['fit_time_s']:.1f}s fit, {want['senti_time_s']:.1f}s"
                  f" senti) metrics={want['metrics']}", flush=True)
        except (SystemExit, ValueError, FloatingPointError) as e:
            # the reference aborts the PROCESS on infinite losses
            # (losses.py:258-264 sys.exit) — and its guard checks
            # ``abs(min) == inf`` only, so NaN losses slip through and
            # poison the pipeline until sklearn raises ValueError at metric
            # time.  If mmtpu also went non-finite, that is divergence
            # PARITY for this config (mmtpu records NaN per config instead
            # of crashing — see mmtpu/runner.py).
            want = None
            print(f"[parity]   reference: diverged/crashed "
                  f"({type(e).__name__}: {e})", flush=True)

        if want is None:
            row = {
                "config": cfg,
                "n_epochs": args.n_epochs,
                "ref_diverged_sys_exit": True,
                "mmtpu_final_train_loss": got["final_train_loss"],
                "mmtpu_diverged": not np.isfinite(got["final_train_loss"]),
            }
        else:
            deltas = {
                s: float(np.max(np.abs(got["latents"][s] - want["latents"][s])))
                for s in ("train", "valid", "test")
            }
            row = {
                "config": cfg,
                "n_epochs": args.n_epochs,
                "ref_final_train_loss": want["final_train_loss"],
                "mmtpu_final_train_loss": got["final_train_loss"],
                "max_abs_latent_delta": deltas,
                "ref_metrics": want["metrics"],
                "mmtpu_metrics": got["metrics"],
                "ref_fit_time_s": round(want["fit_time_s"], 1),
                "mmtpu_fit_time_s": round(got["fit_time_s"], 1),
            }
        rows.append(row)
        json.dump({"dataset": args.dataset, "rows": rows,
                   "n_epochs": args.n_epochs,
                   "senti_epochs": args.senti_epochs, "seed": args.seed},
                  open(args.out, "w"), indent=2)

    # markdown table (per-trait POM lists collapse to their mean here; the
    # full per-trait vectors live in the JSON)
    def _scalar(m, key):
        v = m.get(key, float("nan"))
        return float(np.mean(v)) if isinstance(v, list) else float(v)

    k3 = "accuracy" if args.dataset != "pom" else "f_score"
    print(f"\n| config | ref loss | mmtpu loss | max|Δlat| | ref MAE | mmtpu "
          f"MAE | ref corr | mmtpu corr | ref {k3} | mmtpu {k3} |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        c = r["config"]
        if r.get("ref_diverged_sys_exit"):
            print(f"| {c['optimizer']}+{c['norm']} | sys.exit(inf) "
                  f"| {r['mmtpu_final_train_loss']} | — divergence parity "
                  f"| | | | | | |")
            continue
        rm, gm = r["ref_metrics"], r["mmtpu_metrics"]
        print(f"| {c['optimizer']}+{c['norm']} "
              f"| {r['ref_final_train_loss']:.4f} "
              f"| {r['mmtpu_final_train_loss']:.4f} "
              f"| {max(r['max_abs_latent_delta'].values()):.2e} "
              f"| {_scalar(rm, 'mae'):.4f} "
              f"| {_scalar(gm, 'mae'):.4f} "
              f"| {_scalar(rm, 'corr'):.4f} "
              f"| {_scalar(gm, 'corr'):.4f} "
              f"| {_scalar(rm, k3):.4f} "
              f"| {_scalar(gm, k3):.4f} |")
    print(f"\n[parity] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

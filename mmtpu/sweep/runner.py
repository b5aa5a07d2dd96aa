"""The vmapped, mesh-sharded sweep executor.

ONE jitted program trains K configs simultaneously: latent fit (e2e or
likelihood-only), valid/test latent inference, sentiment training, and
device-side metrics — all under a leading config axis, sharded over the
"config" mesh axis (pure data parallel over ICI, no cross-config traffic).

Wall-clock model: the reference runs 512 serial processes, each re-loading
data and re-tracing the same math; mmtpu compiles once per chunk shape and
reuses the executable for every chunk of the same (optimizer, n_epochs)
bucket (``chunk_size`` bounds HBM; buckets bake the optimizer as a static
kind and scan only their own epoch count instead of the grid-wide max).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from mmtpu.data.pipeline import PreparedData
from mmtpu.eval.metrics import iemocap_metrics, mosi_metrics, pom_metrics
from mmtpu.models.decoder import init_decoder
from mmtpu.models.sentiment import apply_sentiment, init_sentiment
from mmtpu.sweep.pack import SweepStatics, pack_configs, statics_from_configs
from mmtpu.train.e2e import E2EFitSpec, fit_e2e
from mmtpu.train.latents import LatentFitSpec, fit_latents, train_view
from mmtpu.train.sentiment import SentimentFitSpec, fit_sentiment


@dataclasses.dataclass
class SweepResult:
    """Per-config arrays (leading axis = config), ordered as the input list."""

    config_nums: np.ndarray
    run_idxs: np.ndarray
    final_train_loss: np.ndarray
    metrics: Dict[str, np.ndarray]  # per-config "after" test metrics
    wall_time_s: float
    n_configs: int
    compile_time_s: float = 0.0
    # phased mode only: total warm-dispatch (executable settling) seconds —
    # one full untimed execution per phase program so the phase table shows
    # steady state.  Kept OUT of compile_time_s so phased-vs-composed
    # compile times stay comparable (VERDICT r4 weak #5), and out of
    # exec_time_s (see property) so neither bucket double-books it.
    settle_time_s: float = 0.0
    # per-chunk completion records ({chunk, kind, n_epochs, configs, done_at_s}
    # relative to sweep start) — the exec-vs-compile split and per-bucket
    # timings relay instances make incomparable otherwise (BASELINE.md)
    chunk_stats: Optional[List[dict]] = None
    # with run_sweep(return_embeddings=True): per-config trained latent
    # tables, {"train"/"valid"/"test": (K, N_split, D) float32}
    embeddings: Optional[Dict[str, np.ndarray]] = None

    @property
    def exec_time_s(self) -> float:
        """Wall minus compile (minus phased-mode settling) — the
        relay-stable signal (CLAUDE.md)."""
        return max(self.wall_time_s - self.compile_time_s
                   - self.settle_time_s, 0.0)

    def to_records(self) -> List[dict]:
        out = []
        for i in range(self.n_configs):
            rec = {
                "config_num": int(self.config_nums[i]),
                "run": int(self.run_idxs[i]),
                "final_train_loss": float(self.final_train_loss[i]),
            }
            for k, v in self.metrics.items():
                val = np.asarray(v[i])
                rec[k] = val.tolist() if val.ndim else float(val)
            out.append(rec)
        return out


def metric_schema(prep) -> Dict[str, tuple]:
    """Per-config metric names → trailing shapes for ``prep``'s dataset —
    mirrors the metric-fn selection below (mosi_metrics/pom_metrics/
    iemocap_metrics output keys; kept in sync by tests/test_multihost.py)."""
    if prep.name == "mosi":
        return {k: () for k in ("mae", "corr", "mult_acc", "f_score", "accuracy")}
    if prep.name == "pom":
        t = int(prep.labels["test"].shape[1])
        return {k: (t,) for k in ("mae", "corr", "mult_acc", "f_score")}
    return {k: () for k in ("accuracy", "f_score")}


def empty_sweep_result(prep, valid_curve_len: int = 0) -> "SweepResult":
    """Zero-config :class:`SweepResult` with the correct metric schema —
    lets a process whose multihost shard is empty still participate in the
    end-of-sweep allgather (pytree structure must match across processes).

    ``valid_curve_len`` > 0 adds the ``valid_curve`` column a
    ``validation_curve=True`` sweep emits (width must match the peers':
    grid-wide ``n_epochs_max + 1`` — see :func:`run_sweep_multihost`)."""
    schema = metric_schema(prep)
    if valid_curve_len > 0:
        schema["valid_curve"] = (valid_curve_len,)
    return SweepResult(
        config_nums=np.zeros((0,), np.int64),
        run_idxs=np.zeros((0,), np.int64),
        final_train_loss=np.zeros((0,), np.float32),
        metrics={k: np.zeros((0,) + s, np.float32)
                 for k, s in schema.items()},
        wall_time_s=0.0,
        n_configs=0,
    )


def _data_axes(data: Dict) -> Dict:
    """vmap in_axes for the shared data dict: everything broadcast except the
    per-config positional channel mask."""
    return {k: (0 if k == "pos_mask" else None) for k in data}


def _stacked_sentiment_init(keys, embed_dim, hidden_dims, n_out, hidden_max):
    """Per-config sentiment MLPs with zero-padded dead units, stacked."""
    params = [
        init_sentiment(k, embed_dim, int(h), n_out, hidden_pad=hidden_max)
        for k, h in zip(keys, hidden_dims)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params)


def build_sweep_parts(statics: SweepStatics, labels, vocab, dataset_name: str,
                      senti_mask=None):
    """The sweep program's four phases as separately-callable (vmapped,
    unjitted) functions — :func:`build_sweep_fn` composes them into the ONE
    production program; ``run_sweep(phase_timing=True)`` jits and times each
    individually (the per-phase exec split VERDICT r3 §3 asked for).

    ``senti_mask`` is the sweep-level 0/1 labeled mask for semi-supervised
    runs (the reference's ``--semi_sup_idxes`` is a CLI flag shared by every
    config, not a grid axis — simplesif.py:194): in e2e buckets it zeroes the
    sentiment term of unlabeled rows inside the joint loss
    (simplesif.py:779-784), and in BOTH modes the downstream sentiment phase
    trains on the labeled row subset only (sentiment_model.py:189-194).
    """
    senti_sel = None
    if senti_mask is not None:
        senti_sel = np.nonzero(np.asarray(senti_mask))[0]  # static row subset
        senti_mask = jnp.asarray(senti_mask, jnp.float32)
    partition_fn = None
    if statics.use_pallas:
        from mmtpu.kernels.angular import angular_partition_pallas

        partition_fn = angular_partition_pallas
    valid_every = 80 if statics.validation_curve else 0  # valid_niter*8
    lspec = LatentFitSpec(
        n_epochs_max=statics.n_epochs_max,
        batch_size=statics.batch_size,
        train_decoder=True,
        unimodal=statics.unimodal,
        word_metric=statics.word_metric,
        unroll=statics.unroll,
        opt_kind=statics.opt_kind,
        partition_fn=partition_fn,
        valid_every=valid_every,
        lazy_adam=statics.lazy_adam,
        fused_dec_update=statics.fused_dec_update,
    )
    espec = E2EFitSpec(
        n_epochs_max=statics.n_epochs_max,
        batch_size=statics.batch_size,
        unimodal=statics.unimodal,
        word_metric=statics.word_metric,
        unroll=statics.unroll,
        opt_kind=statics.opt_kind,
        partition_fn=partition_fn,
        valid_every=valid_every,
        lazy_adam=statics.lazy_adam,
        fused_dec_update=statics.fused_dec_update,
    )
    infer_ne_max = statics.n_epochs_max
    if statics.infer_epochs_cap:
        # the cap shrinks the inference scan itself — real compute saving,
        # opt-in non-parity (SweepStatics.infer_epochs_cap)
        infer_ne_max = min(infer_ne_max, statics.infer_epochs_cap)
    ispec = LatentFitSpec(
        n_epochs_max=infer_ne_max,
        batch_size=statics.batch_size * 8,
        train_decoder=False,
        unimodal=statics.unimodal,
        word_metric=statics.word_metric,
        shuffle=False,
        unroll=statics.unroll,
        opt_kind=statics.opt_kind,
        partition_fn=partition_fn,
        lazy_adam=statics.lazy_adam,
    )
    sspec = SentimentFitSpec(
        n_epochs_max=statics.n_sentiment_epochs_max,
        early_stopping=statics.early_stopping,
        unroll=statics.unroll,
    )
    if dataset_name == "mosi":
        metric_fn = mosi_metrics
    elif dataset_name == "pom":
        metric_fn = pom_metrics
    else:
        metric_fn = iemocap_metrics

    def one_train(rng, init_embed, dec, senti, hp, dtr, validation):
        if statics.e2e:
            out = fit_e2e(
                rng, init_embed, dec, senti, dtr, labels["train"], vocab, hp,
                espec, senti_mask, validation=validation,
            )
            if statics.validation_curve:
                embed, dec2, _, losses, vcurve = out
            else:
                (embed, dec2, _, losses), vcurve = out, None
        else:
            out = fit_latents(rng, init_embed, dec, dtr, vocab, hp, lspec,
                              validation)
            if statics.validation_curve:
                embed, dec2, losses, vcurve = out
            else:
                (embed, dec2, losses), vcurve = out, None
        return embed, dec2, losses, (jnp.zeros((0,)) if vcurve is None
                                     else vcurve)

    # --- phase 1: train latents (+decoder, + sentiment head if e2e) ---
    def phase_train(rngs, init_embeds, dec_stack, senti_stack, hp,
                    data_train, data_valid):
        dax = _data_axes(data_train)
        validation = None
        val_ax = None
        if statics.validation_curve:
            validation = (init_embeds["valid"], data_valid)
            val_ax = (None, dax)
        return jax.vmap(
            one_train, in_axes=(0, None, 0, 0, 0, dax, val_ax)
        )(rngs, init_embeds["train"], dec_stack, senti_stack, hp, data_train,
          validation)

    # --- phase 2: inference = optimization on valid/test (frozen dec) ---
    def _ispec_for(n_rows: int):
        """Single-batch inference fits shrink their static batch to the next
        batch_size multiple >= n_rows (SweepStatics.infer_batch_clamp):
        identical row grouping — all real rows still share the one batch —
        so the only deltas are float reduction order; the padded compute
        (e.g. 283 dead rows of MOSI valid's 229-row batch at the reference's
        512) goes away.  Multi-batch splits keep the reference's batch."""
        full = ispec.batch_size
        if not statics.infer_batch_clamp or n_rows >= full:
            return ispec
        eff = min(full, -(-n_rows // statics.batch_size) * statics.batch_size)
        return dataclasses.replace(ispec, batch_size=eff)

    def infer(rng, init_e, dec, hp, d):
        if statics.infer_warm_start:
            from mmtpu.train.warm_start import closed_form_latents_from_stats

            init_e = closed_form_latents_from_stats(
                dec, d, vocab, unimodal=statics.unimodal)
        ihp = hp
        if statics.infer_epochs_cap:
            ihp = dict(hp, n_epochs=jnp.minimum(
                hp["n_epochs"], statics.infer_epochs_cap))
        e, _, _ = fit_latents(rng, init_e, dec, d, vocab, ihp,
                              _ispec_for(init_e.shape[0]))
        return e

    def phase_infer(rngs, init_e, decs, hp, d):
        return jax.vmap(infer, in_axes=(0, None, 0, 0, _data_axes(d)))(
            rngs, init_e, decs, hp, d
        )

    # --- phase 3: downstream sentiment training ---
    # semi-sup: train on the labeled row subset only (the mask is
    # sweep-level, so the subset is a static gather shared by all configs)
    y_train = labels["train"]
    if senti_sel is not None:
        y_train = y_train[senti_sel]

    def sent(rng, senti, tr_e, va_e, shp):
        tr_lat = tr_e if senti_sel is None else tr_e[senti_sel]
        last, _, _, _ = fit_sentiment(
            rng, senti, tr_lat, y_train, va_e, labels["valid"],
            shp, sspec,
        )
        return last

    def phase_sent(rngs, senti_stack, embeds, valid_e, s_hp):
        return jax.vmap(sent, in_axes=(0, 0, 0, 0, 0))(
            rngs, senti_stack, embeds, valid_e, s_hp
        )

    # --- phase 4: device-side metrics on test ---
    def score(senti, te):
        pred = apply_sentiment(senti, te)
        return metric_fn(pred, labels["test"])

    def phase_score(senti_final, test_e):
        return jax.vmap(score)(senti_final, test_e)

    return {
        "train": phase_train,
        "infer": phase_infer,
        "sent": phase_sent,
        "score": phase_score,
    }


def build_sweep_fn(statics: SweepStatics, labels, vocab, dataset_name: str,
                   return_embeddings: bool = False, senti_mask=None):
    """Construct the single jitted sweep program for one chunk shape, as the
    composition of :func:`build_sweep_parts`'s four phases."""
    parts = build_sweep_parts(statics, labels, vocab, dataset_name,
                              senti_mask=senti_mask)

    def sweep(rngs, init_embeds, dec_stack, senti_stack, hp, s_hp,
              data_train, data_valid, data_test):
        embeds, decs, losses, vcurves = parts["train"](
            rngs, init_embeds, dec_stack, senti_stack, hp,
            data_train, data_valid,
        )
        valid_e = parts["infer"](rngs, init_embeds["valid"], decs, hp,
                                 data_valid)
        test_e = parts["infer"](rngs, init_embeds["test"], decs, hp,
                                data_test)
        senti_final = parts["sent"](rngs, senti_stack, embeds, valid_e, s_hp)
        metrics = parts["score"](senti_final, test_e)
        epoch_idx = jnp.clip(hp["n_epochs"] - 1, 0, statics.n_epochs_max - 1)
        final_loss = jax.vmap(lambda l, i: l[i])(losses, epoch_idx)
        out = {"metrics": metrics, "final_train_loss": final_loss}
        if statics.validation_curve:
            out["valid_curve"] = vcurves  # (K, n_epochs_max + 1), NaN between samples
        if return_embeddings:
            out["embeddings"] = {"train": embeds, "valid": valid_e, "test": test_e}
        return out

    return jax.jit(sweep)


def run_sweep(
    configs: Sequence[dict],
    prep: PreparedData,
    batch_size: int = 64,
    unimodal: bool = False,
    seed: int = 0,
    chunk_size: Optional[int] = None,
    mesh=None,
    return_embeddings: bool = False,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    unroll: int = 1,
    n_runs: int = 1,
    use_pallas: Optional[bool] = None,
    senti_mask: Optional[np.ndarray] = None,
    validation_curve: bool = False,
    lazy_adam: Optional[bool] = None,
    phase_timing: bool = False,
    infer_batch_clamp: bool = False,
    fused_dec_update: bool = False,
    infer_warm_start: bool = False,
    infer_epochs_cap: int = 0,
) -> SweepResult:
    """Run every config of the grid in vmapped chunks.

    Args:
        configs: list of config dicts (reference JSON format).
        prep: :func:`prepare_device_data` output in ``pos_mode="shared"`` with
            ``pos_max_dim >= max(pos_embed_dim)`` (or no positional dims).
        chunk_size: configs per compiled program (bounds HBM); default = all.
        mesh: optional ``jax.sharding.Mesh`` with a "config" axis — stacked
            per-config state is sharded across it, shared data replicated.
        checkpoint_dir: if set, per-chunk results are persisted there and a
            restarted sweep resumes at the first incomplete chunk (the
            reference has no resume of any kind — SURVEY.md §5).
        n_runs: repetitions per config with independent seeds (the
            reference's --n_runs, simplesif.py:193); expands the config list
            as (config, run) pairs along the same vmap axis.
        senti_mask: sweep-level 0/1 labeled mask over train rows for
            semi-supervised runs (see :func:`build_sweep_fn`).
        validation_curve: emit per-config recursive validation-loss curves
            (reference cadence 80 — simplesif.py:146-159/795-799) as a
            ``valid_curve`` column; expensive, mirrors the runner's
            ``--validation_curve``.
        use_pallas: fused Pallas kernel for the angular partition.  None
            (default) = on for TPU backends, off elsewhere; the ~13-29%
            per-chunk execution savings recur while the one-time Mosaic
            compile is amortized by the persistent compilation cache.
            Pass False to force the unfused XLA path.
        lazy_adam: epoch-level lazy Adam for the latent tables
            (mmtpu/train/optim.py) — slice-only per-step work instead of
            three full-table passes per step.  None (default) = ON: the
            trajectory deltas are float-rounding-level, inside the envelope
            the sweep's bf16 matmul default already accepts
            (PRECISION_STUDY.json).  Pass False (CLI ``--exact_adam``) for
            the torch-exact dense path (what the parity harness uses).
        phase_timing: DIAGNOSTIC mode — run each chunk as the four phase
            programs of :func:`build_sweep_parts` (train fit / valid fit /
            test fit / sentiment / metrics) instead of the one composed
            program, recording per-phase device seconds in each
            ``chunk_stats`` entry under ``"phases"``.  Adds a host sync per
            phase (~0.1 s/chunk on the relay) and compiles phase programs
            instead of the composed one; results are numerically equivalent
            (same functions, separate XLA fusion scopes).  Each phase
            program's first use also pays one full untimed warm execution
            (relay settling), timed separately as
            ``SweepResult.settle_time_s`` — so ``compile_time_s`` stays
            comparable to composed mode, but each bucket's first chunk runs
            every phase twice (diagnostic cost ~one extra chunk per bucket).
        infer_batch_clamp: shrink single-batch inference fits' static batch
            to the split's row count (see SweepStatics.infer_batch_clamp);
            float-reduction-order deltas only.  Default OFF since round 5:
            the on-chip A/B measured the clamp 0.92x — slower than the
            reference's padded batch (docs/measurements/r5/clamp.log).
        infer_warm_start: initialize valid/test inference fits from the
            trained decoder's closed-form latent estimate
            (mmtpu/train/warm_start.py) instead of the SIF embedding.
            Opt-in, NOT reference-parity (different init → different
            trajectory); pair with infer_epochs_cap for the compute win.
        infer_epochs_cap: cap inference-fit epochs (0 = the config's full
            n_epochs, reference semantics — simplesif.py:607-610).  Shrinks
            the inference scan length itself.  Opt-in, NOT reference-parity.
    """
    import dataclasses as _dc

    if n_runs > 1:
        configs = [
            dict(c, _run_idx=r) for c in configs for r in range(n_runs)
        ]
    statics = statics_from_configs(configs, batch_size=batch_size, unimodal=unimodal)
    if unroll != 1:
        statics = _dc.replace(statics, unroll=unroll)
    if validation_curve:
        statics = _dc.replace(statics, validation_curve=True)
    if use_pallas is None:
        # default ON for TPU sweeps whose effective row count (configs/chunk
        # x batch) amortizes the fused kernel: measured per-chunk execution
        # savings of ~13% (adam buckets) / ~29% (sgd buckets) recur every
        # chunk, while the extra Mosaic compile (~1-2 min across buckets) is
        # paid once ever — the CLIs enable the persistent compilation cache,
        # so subsequent processes reuse the compiled kernels (measured:
        # 16-cfg sweep 96.7 s cold → 65.0 s warm, vs 66.9 s without the
        # kernel).  Below MIN_PALLAS_ROWS the kernel is a wash vs XLA
        # (scripts/diag_b64_pallas.py) and the compile isn't worth it.
        from mmtpu.kernels.angular import MIN_PALLAS_ROWS, pallas_available

        eff_rows = min(chunk_size or len(configs), len(configs)) * batch_size
        use_pallas = pallas_available() and eff_rows >= MIN_PALLAS_ROWS
    if use_pallas and statics.word_metric == "angular":
        statics = _dc.replace(statics, use_pallas=True)
    if lazy_adam is None or lazy_adam:
        statics = _dc.replace(statics, lazy_adam=True)
    if infer_batch_clamp:
        statics = _dc.replace(statics, infer_batch_clamp=True)
    if fused_dec_update:
        # fused decoder-update kernel (train fit only) — needs the static
        # per-bucket optimizer kind the executor always uses
        statics = _dc.replace(statics, fused_dec_update=True)
    if infer_warm_start:
        statics = _dc.replace(statics, infer_warm_start=True)
    if infer_epochs_cap:
        statics = _dc.replace(statics, infer_epochs_cap=int(infer_epochs_cap))
    if statics.pos_max > 0:
        if prep.pos_table is None:
            raise ValueError(
                "sweep needs prepare_device_data(..., pos_mode='shared', "
                f"pos_dims={statics.pos_dims})"
            )
        # per-config masks are laid out against the PREPARED table's block
        # structure — rebase statics onto it (a misaligned layout would
        # silently select wrong channels)
        prep_dims = tuple(int(p) for p in (prep.pos_dims or ()))
        if not set(statics.pos_dims) <= set(prep_dims):
            raise ValueError(
                f"configs use pos_embed_dim {statics.pos_dims} but the "
                f"prepared table has blocks {prep_dims}; prepare with "
                f"pos_dims={statics.pos_dims}"
            )
        statics = _dc.replace(
            statics, pos_dims=prep_dims, pos_max=sum(prep_dims)
        )

    k_total = len(configs)
    # default chunk: bounded — very wide single dispatches exceed HBM and/or
    # relay-tunneled backends' per-dispatch limits (CLAUDE.md)
    chunk = chunk_size or min(k_total, 32)

    # device placement (shared tensors once, replicated under a mesh)
    from mmtpu.parallel.mesh import config_sharding, replicated

    def shard_cfg(tree):
        if mesh is None:
            return tree
        s = config_sharding(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, s), tree)

    def shard_rep(tree):
        if mesh is None:
            return jax.tree.map(jnp.asarray, tree)
        s = replicated(mesh)
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), tree)

    data = {s: shard_rep(train_view(prep.splits[s])) for s in ("train", "valid", "test")}
    labels = shard_rep({s: prep.labels[s] for s in ("train", "valid", "test")})
    vocab = shard_rep(jnp.asarray(prep.vocab_embeddings))
    init_embeds = shard_rep({s: prep.sif_init[s] for s in ("train", "valid", "test")})

    # positional channel count follows the prepared table's width (the
    # decoder sees every table channel; per-config masks switch them off)
    p_tab = 0 if prep.pos_table is None else int(prep.pos_table.shape[-1])
    audio_dim = prep.audio_dim + p_tab
    visual_dim = prep.visual_dim + p_tab
    n_out = 1 if prep.labels["train"].ndim == 1 else prep.labels["train"].shape[-1]

    # per-config keys derive from fold_in(config_num) so results are
    # independent of chunking layout and config order
    root = jax.random.key(seed)
    dec_root, sent_root, run_root = jax.random.split(root, 3)
    results_loss = np.zeros(k_total, np.float32)
    metrics_out: Dict[str, np.ndarray] = {}
    embeds_out: Dict[str, np.ndarray] = {}  # "emb_train"/... when requested
    t0 = time.time()
    compile_time = 0.0
    settle_time = 0.0  # phased-mode warm dispatches (see _run_compiled)

    # ---- bucket by (optimizer, n_epochs): a homogeneous bucket bakes the
    # optimizer as a STATIC kind (SGD buckets skip moment buffers and use
    # row-sparse embedding updates — see mmtpu.train.optim / latents), and
    # its program scans only the bucket's OWN epoch count — without the
    # epoch axis, every chunk would run the grid-wide max and configs with
    # fewer epochs would burn the difference in masked no-op steps (the
    # shipped grid mixes 100/200 epochs → ~25% of train+infer exec).  An
    # arbitrary grid with many distinct epoch counts would explode the
    # compile count, so past 4 unique values the epoch axis collapses back
    # to the global max (masking keeps it exact either way). ----
    ne_values = sorted({int(c.get("n_epochs", 100)) for c in configs})
    split_epochs = 1 < len(ne_values) <= 4
    by_key: Dict[tuple, list] = {}
    for i, c in enumerate(configs):
        kind = c.get("optimizer", "sgd")
        ne = (int(c.get("n_epochs", 100)) if split_epochs
              else statics.n_epochs_max)
        by_key.setdefault((kind, ne), []).append(i)
    buckets = [(k, ne, pos) for (k, ne), pos in sorted(by_key.items())]

    work = []  # (chunk_id str, opt_kind, n_epochs_max, positions list)
    for kind, ne, positions in buckets:
        for ci in range(-(-len(positions) // chunk)):
            pos = positions[ci * chunk : (ci + 1) * chunk]
            work.append((f"{kind}{ne}_{ci}", kind, ne, pos))
    n_chunks = len(work)

    # ---- chunk-level checkpoint / resume ----
    import hashlib as _hashlib
    import json as _json
    import os as _os

    # fingerprint everything that determines per-chunk results, so a resume
    # against a checkpoint_dir from a *different* sweep (changed seed, batch
    # size, configs, ...) refuses the stale chunks instead of merging them
    fingerprint = _hashlib.sha256(
        _json.dumps(
            {
                "bucketing": "opt+epochs",  # chunk-id scheme version
                "return_embeddings": return_embeddings,  # changes npz contents
                "phase_timing": phase_timing,  # separate fusion scopes
                "seed": seed,
                "batch_size": batch_size,
                "unimodal": unimodal,
                "statics": dataclasses.asdict(statics),
                "configs": configs,
                "senti_mask": (
                    None if senti_mask is None
                    else np.asarray(senti_mask).tolist()
                ),
            },
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()

    done_chunks: Dict[str, dict] = {}
    state_path = None
    if checkpoint_dir is not None:
        _os.makedirs(checkpoint_dir, exist_ok=True)
        state_path = _os.path.join(checkpoint_dir, "sweep_state.json")
        if _os.path.isfile(state_path):
            st = _json.load(open(state_path))
            if (st.get("n_configs") == k_total and st.get("chunk") == chunk
                    and st.get("fingerprint") == fingerprint):
                for cid in st.get("chunks", []):
                    npz = np.load(
                        _os.path.join(checkpoint_dir, f"chunk_{cid}.npz")
                    )
                    done_chunks[str(cid)] = {k: npz[k] for k in npz.files}
                if verbose and done_chunks:
                    print(f"[sweep] resuming: {len(done_chunks)}/{n_chunks} "
                          f"chunks already complete")
            elif verbose:
                print("[sweep] checkpoint_dir holds a different sweep "
                      "(fingerprint mismatch) — starting fresh")

    def scatter_results(positions, chunk_loss, chunk_metrics):
        n_real = len(positions)
        results_loss[positions] = chunk_loss[:n_real]
        for mk, mv in chunk_metrics.items():
            tgt = embeds_out if mk.startswith("emb_") else metrics_out
            if mk not in tgt:
                tgt[mk] = np.zeros((k_total,) + mv.shape[1:], mv.dtype)
            tgt[mk][positions] = mv[:n_real]

    sweep_fns: Dict[str, object] = {}

    # one-chunk-deep software pipeline: chunk k's results are materialized
    # (device→host transfer, scatter, checkpoint write) while chunk k+1 is
    # already executing on the device — the host never sits between the
    # device and the next dispatch.
    pending = None  # (positions, out, chunk_id, wi, kind)
    chunk_stats: List[dict] = []

    def drain(p):
        positions, out, chunk_id, wi, kind = p
        phases = out.pop("_phase_times", None)  # phased-mode host dict
        chunk_loss = np.asarray(out["final_train_loss"])  # blocks on the chunk
        chunk_metrics = {mk: np.asarray(mv) for mk, mv in out["metrics"].items()}
        if "valid_curve" in out:
            vc = np.asarray(out["valid_curve"])
            # epoch-bucketed chunks emit (K, bucket_ne + 1) curves — pad to
            # the grid-wide width so scatter targets one shared array
            full = statics.n_epochs_max + 1
            if vc.shape[-1] < full:
                vc = np.pad(vc, ((0, 0), (0, full - vc.shape[-1])),
                            constant_values=np.nan)
            chunk_metrics["valid_curve"] = vc
        if "embeddings" in out:
            for s, v in out["embeddings"].items():
                chunk_metrics[f"emb_{s}"] = np.asarray(v)
        scatter_results(positions, chunk_loss, chunk_metrics)
        if state_path is not None:
            np.savez(
                _os.path.join(checkpoint_dir, f"chunk_{chunk_id}.npz"),
                final_train_loss=chunk_loss,
                **chunk_metrics,
            )
            done_chunks[chunk_id] = {}  # mark complete (data already merged)
            tmp = state_path + ".tmp"
            _json.dump(
                {"n_configs": k_total, "chunk": chunk,
                 "fingerprint": fingerprint,
                 "chunks": sorted(done_chunks)},
                open(tmp, "w"),
            )
            _os.replace(tmp, state_path)
        chunk_stats.append({
            "chunk": chunk_id, "kind": kind, "configs": len(positions),
            "done_at_s": round(time.time() - t0, 2),
            **({"phases": phases} if phases else {}),
        })
        if verbose:
            print(f"[sweep] chunk {wi + 1}/{n_chunks} [{kind}] done "
                  f"({len(positions)} configs, {time.time() - t0:.1f}s)")

    def chunk_args(kind, ne_max, positions):
        """Device-ready argument tuple for one chunk of a bucket."""
        chunk_cfgs = [configs[p] for p in positions]
        pad_n = chunk - len(chunk_cfgs)
        chunk_cfgs = chunk_cfgs + [chunk_cfgs[0]] * pad_n  # shape-stable padding

        hp_np = pack_configs(chunk_cfgs, statics)
        # unique per (config, run): fold in a combined id
        uid = jnp.asarray(hp_np["config_num"] * 1024 + hp_np["run_idx"])
        dec_keys = jax.vmap(lambda c: jax.random.fold_in(dec_root, c))(uid)
        dec_stack = jax.vmap(
            lambda k: init_decoder(
                k, prep.embed_dim, audio_dim, visual_dim,
                unimodal=statics.unimodal, text_dim=prep.text_gauss_dim,
            )
        )(dec_keys)
        sent_keys = jax.vmap(lambda c: jax.random.fold_in(sent_root, c))(uid)
        senti_stack = _stacked_sentiment_init(
            sent_keys, prep.embed_dim, hp_np["hidden_dims"], n_out,
            statics.hidden_max,
        )
        rngs = jax.vmap(lambda c: jax.random.fold_in(run_root, c))(uid)

        hp = shard_cfg({
            "lr": jnp.asarray(hp_np["lr"]),
            "word_loss_weight": jnp.asarray(hp_np["word_loss_weight"]),
            "likelihood_weight": jnp.asarray(hp_np["likelihood_weight"]),
            "opt_code": jnp.asarray(hp_np["opt_code"]),
            "norm_code": jnp.asarray(hp_np["norm_code"]),
            "n_epochs": jnp.asarray(hp_np["n_epochs"]),
            # per-config freeze_weights gates: fit_latents reads "train_dec"
            # (whole decoder), fit_e2e reads "train_heads" (heads only — the
            # reference's e2e freeze leaves the norm trainable)
            "train_dec": jnp.asarray(hp_np["train_dec"]),
            "train_heads": jnp.asarray(hp_np["train_dec"]),
        })
        s_hp = shard_cfg({
            "lr": jnp.asarray(hp_np["sentiment_lr"]),
            "lr_decay": jnp.asarray(hp_np["lr_decay"]),
            "n_epochs": jnp.asarray(hp_np["n_sentiment_epochs"]),
        })
        dec_stack = shard_cfg(dec_stack)
        senti_stack = shard_cfg(senti_stack)
        rngs = shard_cfg(rngs)

        # per-config positional channel mask rides in the data dict
        dtr = dict(data["train"])
        dva = dict(data["valid"])
        dte = dict(data["test"])
        if prep.pos_table is not None:
            pm_np = hp_np["pos_mask"]
            if pm_np.shape[-1] < p_tab:  # pad to the table width
                pm_np = np.pad(pm_np, ((0, 0), (0, p_tab - pm_np.shape[-1])))
            pm = shard_cfg(jnp.asarray(pm_np))
            dtr["pos_mask"] = dva["pos_mask"] = dte["pos_mask"] = pm
        return (rngs, init_embeds, dec_stack, senti_stack, hp, s_hp,
                dtr, dva, dte)

    def build_bucket_fn(kind, ne_max):
        return build_sweep_fn(
            _dc.replace(statics, opt_kind=kind, n_epochs_max=ne_max),
            labels, vocab, prep.name,
            return_embeddings=return_embeddings, senti_mask=senti_mask,
        )

    # ---- phased diagnostic executor (phase_timing=True) ----
    bucket_parts: Dict[tuple, dict] = {}
    compiled_phases: Dict[tuple, object] = {}

    def _run_compiled(cache_key, fn, *a):
        """AOT-compile once (into compile_time), execute, and stop the clock
        on a device-side scalar token — np.asarray on a big output would put
        the relay transfer inside the phase's exec time.

        CAVEAT (documented per VERDICT r4 weak #5): each phase program's
        first use pays one full untimed warm execution — the relay's FIRST
        dispatch of a freshly loaded executable runs multi-x slower than
        steady state (settling, ~0.8 s observed on trivial programs), and
        the phase table must report steady-state seconds.  That warm run is
        timed SEPARATELY into ``settle_time`` (reported as
        ``SweepResult.settle_time_s``), NOT into compile_time — so
        phased-mode ``compile_time_s`` is comparable to composed-mode's,
        and each bucket's first chunk genuinely executes every phase twice
        (once settling, once timed): phased mode costs ~one extra chunk of
        device work per bucket.
        """
        nonlocal compile_time, settle_time
        if cache_key not in compiled_phases:
            def tokened(*args_):
                o = fn(*args_)
                return o, jnp.sum(jax.tree.leaves(o)[0])
            tc = time.time()
            compiled = jax.jit(tokened).lower(*a).compile()
            compile_time += time.time() - tc
            ts = time.time()
            _, tok = compiled(*a)
            np.asarray(tok)
            settle_time += time.time() - ts
            compiled_phases[cache_key] = compiled
        te = time.time()
        out, token = compiled_phases[cache_key](*a)
        np.asarray(token)  # forces full materialization (CLAUDE.md: axon
        # block_until_ready can return early)
        return out, time.time() - te

    def run_phased(kind, ne_max, args):
        key = (kind, ne_max)
        if key not in bucket_parts:
            bucket_parts[key] = build_sweep_parts(
                _dc.replace(statics, opt_kind=kind, n_epochs_max=ne_max),
                labels, vocab, prep.name, senti_mask=senti_mask,
            )
        parts = bucket_parts[key]
        rngs, ie, dec_stack, senti_stack, hp, s_hp, dtr, dva, dte = args
        times = {}
        (embeds, decs, losses, vcurves), times["train"] = _run_compiled(
            (key, "train"), parts["train"],
            rngs, ie, dec_stack, senti_stack, hp, dtr, dva,
        )
        valid_e, times["valid_infer"] = _run_compiled(
            (key, "infer_valid"), parts["infer"],
            rngs, ie["valid"], decs, hp, dva,
        )
        test_e, times["test_infer"] = _run_compiled(
            (key, "infer_test"), parts["infer"],
            rngs, ie["test"], decs, hp, dte,
        )
        senti_final, times["sentiment"] = _run_compiled(
            (key, "sent"), parts["sent"],
            rngs, senti_stack, embeds, valid_e, s_hp,
        )
        metrics, times["metrics"] = _run_compiled(
            (key, "score"), parts["score"], senti_final, test_e,
        )
        # final-epoch loss select, host-side (the composed program does this
        # on device; K-row gather is trivial either way)
        losses_np = np.asarray(losses)
        idx = np.clip(np.asarray(hp["n_epochs"]) - 1, 0, ne_max - 1)
        out = {
            "metrics": metrics,
            "final_train_loss": losses_np[np.arange(len(idx)), idx.astype(int)],
            "_phase_times": {k: round(v, 3) for k, v in times.items()},
        }
        if statics.validation_curve:
            out["valid_curve"] = vcurves
        if return_embeddings:
            out["embeddings"] = {"train": embeds, "valid": valid_e,
                                 "test": test_e}
        return out

    # ---- concurrent bucket compilation ----
    # Each bucket's program costs minutes of (remote) XLA compilation that
    # the lazy first-dispatch path would pay serially, back to back.  AOT-
    # compile every remaining bucket CONCURRENTLY instead: tracing holds the
    # GIL briefly, the XLA/remote compile releases it, so with B buckets the
    # compile wall-clock is ~max over buckets rather than the sum.
    todo_buckets = []
    for chunk_id, kind, ne, pos in work:
        if chunk_id not in done_chunks and not any(
                key == (kind, ne) for key, _ in todo_buckets):
            todo_buckets.append(((kind, ne), pos))
    if phase_timing:
        todo_buckets = []  # phased mode compiles its own per-phase programs
    if len(todo_buckets) > 1:
        import concurrent.futures as _cf

        def _warm(key, positions):
            fn = build_bucket_fn(*key)
            return key, fn.lower(*chunk_args(key[0], key[1], positions)).compile()

        tc = time.time()
        try:
            with _cf.ThreadPoolExecutor(len(todo_buckets)) as ex:
                futs = [ex.submit(_warm, key, pos) for key, pos in todo_buckets]
                for fut in _cf.as_completed(futs):
                    key, compiled = fut.result()
                    sweep_fns[key] = compiled
            compile_time += time.time() - tc
            if verbose:
                print(f"[sweep] compiled {len(todo_buckets)} bucket programs "
                      f"concurrently in {time.time() - tc:.1f}s")
        except Exception as e:  # fall back to lazy per-bucket compiles
            sweep_fns.clear()
            if verbose:
                print(f"[sweep] concurrent compile failed ({e!r}) — "
                      "falling back to lazy compiles")

    for wi, (chunk_id, kind, ne_max, positions) in enumerate(work):
        if chunk_id in done_chunks:
            saved = done_chunks[chunk_id]
            scatter_results(
                positions,
                saved["final_train_loss"],
                {k: v for k, v in saved.items() if k != "final_train_loss"},
            )
            continue
        args = chunk_args(kind, ne_max, positions)
        try:
            if phase_timing:
                # phased diagnostic path: phases sync the host between them,
                # so drain up front and skip the one-chunk pipeline
                if pending is not None:
                    drain(pending)
                    pending = None
                out = run_phased(kind, ne_max, args)
            elif (kind, ne_max) not in sweep_fns:
                # lazy-compile path (warmup skipped or failed): drain
                # outstanding work first so compile-time accounting isn't
                # polluted by a still-executing prior chunk; AOT-compile via
                # .lower().compile() so the first chunk's EXECUTION stays out
                # of compile_time (exec_time_s is the relay-stable signal)
                if pending is not None:
                    drain(pending)
                    pending = None
                fn = build_bucket_fn(kind, ne_max)
                tc = time.time()
                if hasattr(fn, "lower"):
                    fn = fn.lower(*args).compile()
                    compile_time += time.time() - tc
                    sweep_fns[(kind, ne_max)] = fn
                    out = fn(*args)
                else:  # non-jit callable (test doubles): old accounting
                    sweep_fns[(kind, ne_max)] = fn
                    out = fn(*args)
                    jax.block_until_ready(out["final_train_loss"])
                    compile_time += time.time() - tc
            else:
                # steady state: dispatch is async — materialize the PREVIOUS
                # chunk while this one executes (one-chunk-deep pipeline)
                out = sweep_fns[(kind, ne_max)](*args)
                if pending is not None:
                    drain(pending)
                    pending = None
        except jax.errors.JaxRuntimeError:
            # a too-wide dispatch (HBM or relay-timeout) — retry the whole
            # sweep at half the chunk width (checkpointed chunks of the old
            # width are abandoned; they key on chunk size)
            if chunk <= 2:
                raise
            if verbose:
                print(f"[sweep] chunk width {chunk} failed on device — "
                      f"retrying the sweep at width {chunk // 2}")
            # configs is already (config, run)-expanded at this point, so the
            # retry passes n_runs=1 (the default) to avoid double expansion
            return run_sweep(
                configs, prep, batch_size=batch_size, unimodal=unimodal,
                seed=seed, chunk_size=chunk // 2, mesh=mesh,
                return_embeddings=return_embeddings, verbose=verbose,
                checkpoint_dir=checkpoint_dir, unroll=unroll,
                use_pallas=use_pallas, senti_mask=senti_mask,
                validation_curve=validation_curve,
                lazy_adam=statics.lazy_adam,  # keep --exact_adam exact
                phase_timing=phase_timing,
                infer_batch_clamp=statics.infer_batch_clamp,
                fused_dec_update=statics.fused_dec_update,
                infer_warm_start=statics.infer_warm_start,
                infer_epochs_cap=statics.infer_epochs_cap,
            )

        pending = (positions, out, chunk_id, wi, kind)

    if pending is not None:
        try:
            drain(pending)
        except jax.errors.JaxRuntimeError:
            if chunk <= 2:
                raise
            if verbose:
                print(f"[sweep] chunk width {chunk} failed on device — "
                      f"retrying the sweep at width {chunk // 2}")
            return run_sweep(
                configs, prep, batch_size=batch_size, unimodal=unimodal,
                seed=seed, chunk_size=chunk // 2, mesh=mesh,
                return_embeddings=return_embeddings, verbose=verbose,
                checkpoint_dir=checkpoint_dir, unroll=unroll,
                use_pallas=use_pallas, senti_mask=senti_mask,
                validation_curve=validation_curve,
                lazy_adam=statics.lazy_adam,  # keep --exact_adam exact
                phase_timing=phase_timing,
                infer_batch_clamp=statics.infer_batch_clamp,
                fused_dec_update=statics.fused_dec_update,
                infer_warm_start=statics.infer_warm_start,
                infer_epochs_cap=statics.infer_epochs_cap,
            )

    return SweepResult(
        config_nums=np.asarray([c.get("config_num", i) for i, c in enumerate(configs)]),
        run_idxs=np.asarray([c.get("_run_idx", 0) for c in configs]),
        final_train_loss=results_loss,
        metrics=metrics_out,
        wall_time_s=time.time() - t0,
        n_configs=k_total,
        compile_time_s=compile_time,
        settle_time_s=settle_time,
        chunk_stats=chunk_stats,
        embeddings=(
            {s: embeds_out[f"emb_{s}"] for s in ("train", "valid", "test")}
            if return_embeddings else None
        ),
    )

"""Latent-optimization engine — the heart of MMB training.

TPU-native equivalent of reference ``optimize_latents``
(``simplesif.py:49-162``): the per-utterance embedding table is itself the
parameter being optimized (plus, when training, the decoder), by SGD/Adam on
the negative joint log-likelihood, minibatched with per-epoch reshuffling.
"Inference" for valid/test splits is the same optimization with a frozen
decoder (``simplesif.py:607-610``).

TPU-first design:

- The whole fit — all epochs, all minibatches — is ONE jitted program:
  ``lax.scan`` over epochs around ``lax.scan`` over static-shape minibatches.
  Compile once, reuse for train/valid/test (SURVEY.md §7 "hard parts").
- Minibatches are a PRNG permutation reshaped to ``(n_batches, B)`` with the
  tail padded by index 0 + a validity column; padded rows contribute zero
  loss, zero gradient, and are excluded from batch-norm statistics, exactly
  reproducing the reference's shrunken final batch.
- Hyperparameters that the reference bakes into program structure
  (optimizer kind, norm kind, epoch count, lr, loss weights) are runtime
  scalars here, so a ``vmap`` over configs shares one compiled program —
  the basis of the in-process hyperparameter sweep (``mmtpu.sweep``).
- Concatenated-modality heads are evaluated segment-wise against the base
  data streams (no ``torch.cat`` per step — see ``mmtpu.models.decoder``).

Data dict convention (all jnp arrays, leading axis N = #utterances):
    text_ids      (N, L)      int32 token ids (word-likelihood stream) — the
                              per-token vectors are gathered from the vocab
                              table per batch, never stored (N, L, D); tests
                              may pass pre-gathered "text" (N, L, D) instead
    text_weights  (N, L)      per-token SIF weights
    text_mask     (N, L)      0/1 token mask (reference broadcasts to D;
                              equivalent)
    text_gauss    (N, L, Tg)  Gaussian "text" stream (MOSI: == text;
                              POM/IEMOCAP: aligned embeddings,
                              simplesif.py:86-91)
    text_gauss_mask (N, L)
    audio         (N, L, A)   (+ baked positional channels in parity mode)
    audio_mask    (N, L, A)
    visual        (N, L, V)
    visual_mask   (N, L, V)
Optional shared positional-table entries (sweep mode — channels NOT baked
into audio/visual, see ``mmtpu.models.decoder`` docstring):
    pos_table     (L, P)      sinusoidal table (same for audio and visual)
    pos_mask      (P,)        0/1 per-config active-channel mask
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Mapping

import jax
import jax.numpy as jnp

from mmtpu.models.decoder import (
    MMB1_HEADS,
    MMB2_HEADS,
    apply_decoder,
    apply_decoder_stacked,
    head_segments,
    is_stacked,
    stack_decoder,
    unstack_decoder,
)
from mmtpu.ops.joint import joint_log_prob  # noqa: F401  (re-export convenience)
from mmtpu.ops.gaussian import gaussian_logpdf_masked
from mmtpu.ops.wordprob import word_logprob_angular, word_logprob_dot_prod


@dataclasses.dataclass(frozen=True)
class LatentFitSpec:
    """Static (compile-time) configuration of a latent fit."""

    n_epochs_max: int
    batch_size: int
    train_decoder: bool  # reference: `train and not freeze_weights` (simplesif.py:55-56)
    unimodal: bool  # MMB1 vs MMB2 head set
    word_metric: str = "angular"  # 'angular' | 'dot_prod' (simplesif.py:506-511)
    shuffle: bool = True  # train loader shuffles; valid/test don't (simplesif.py:457-459)
    a: float = 1e-3  # mixture constant (simplesif.py:513)
    partition_fn: Callable | None = None  # Pallas hook for angular Z_s
    # "validation" = a full inner optimization of the valid split's latents
    # with a frozen decoder, every valid_every epochs + once at the end
    # (simplesif.py:146-159; the reference's cadence is valid_niter*8 = 80).
    # 0 disables intermediate validation.
    valid_every: int = 0
    valid_batch_mult: int = 8  # valid loader batch = 8x train (simplesif.py:458)
    # lax.scan unroll factor for the minibatch loop — merges scan iterations
    # to amortize per-step kernel-launch overhead (semantics-neutral)
    unroll: int = 1
    # STATIC optimizer kind ("sgd" | "adam" | None=branchless runtime code).
    # "sgd" additionally enables row-sparse embedding updates (only the batch
    # rows are touched — numerically identical for SGD, whose off-batch rows
    # receive exactly zero update; Adam's stale-momentum semantics require
    # dense updates and keep the full-table path).
    opt_kind: str | None = None
    # Mesh axis name to shard each minibatch's ROWS over (GSPMD): the loss /
    # gradient of every step is computed with the batch split across devices
    # and XLA inserts the psums — one oversized config spans chips with no
    # change to the math (batch-norm statistics stay global because the
    # reduction is over the logically-global batch axis).  Requires calling
    # under a mesh context (see mmtpu.parallel.fit.fit_latents_mesh).
    batch_shard_axis: str | None = None
    # Stacked decoder layout: concatenate the per-head linears ONCE at fit
    # entry (models.decoder.stack_decoder) so every step runs one wide GEMM
    # and the decoder optimizer touches 4 leaves instead of 4·n_heads.
    # Same math per output element; the per-head pytree is restored on return.
    # DEFAULT OFF — measured 2.6–3.6% SLOWER than the per-head path on the
    # production sweep (scripts/diag_stacked.py, chunk 16 and 32, on-chip;
    # docs/DESIGN.md "measured negatives"): under the config-vmapped sweep
    # XLA already batches the head GEMMs, and stacking forces a full-width
    # mu/sigma materialization that defeats per-head fusion.
    stacked_heads: bool = False
    # Epoch-level lazy Adam (mmtpu/train/optim.py): collapse each latent
    # row's zero-gradient "stale momentum" steps into per-epoch closed-form
    # passes — slice-only work per step instead of three full-table sweeps.
    # Same real-arithmetic values; float-rounding-level trajectory deltas
    # (β^k by pow, one accumulated subtraction per epoch), so DEFAULT OFF —
    # the parity path keeps torch-exact dense Adam; the bf16 sweep fast
    # path opts in (SweepStatics.lazy_adam).
    lazy_adam: bool = False
    # Fused decoder update (mmtpu/kernels/decoder_update.py): the head
    # weights travel STACKED (+ zero-padded to the kernel's F tile) and each
    # step's weight-grad GEMM + Adam/SGD update + latent cotangent run in
    # one Pallas pass per leaf — one contiguous HBM stream instead of ~36
    # skinny per-head fusions (docs/DESIGN.md "Quantified floor": the
    # decoder update is the Adam chunk's bandwidth floor).  Exact same
    # update law; float deltas are matmul-accumulation-order only
    # (tests/test_fused_update.py).  Requires a static opt_kind; DEFAULT OFF
    # pending the on-chip A/B (ship gate: VERDICT r4 task 3).
    fused_dec_update: bool = False


def _word_logprob(spec: LatentFitSpec, latents, vocab_emb, b):
    # the per-token word vectors are gathered from the vocab table per batch
    # ((B, L, D), a few hundred KB) rather than materialized per utterance in
    # HBM ((N, L, D) — 2.2 GB at POM's real 1357-token rows); "text" is kept
    # as a fallback for hand-built test dicts
    sent = b["text"] if "text" in b else vocab_emb[b["text_ids"]]
    if spec.word_metric == "angular":
        return word_logprob_angular(
            latents, vocab_emb, b["text_weights"], sent, b["text_mask"],
            a=spec.a, partition_fn=spec.partition_fn,
        )
    if spec.word_metric == "dot_prod":
        return word_logprob_dot_prod(
            latents, vocab_emb, b["text_weights"], sent, b["text_mask"],
            a=spec.a,
        )
    raise NotImplementedError(spec.word_metric)


def _head_parts(head: str, b) -> list:
    """The (statically shaped) data parts a head's Gaussian factors over —
    the base-stream segments (plus shared-table positional blocks), in the
    head's mu/sigma column order."""
    use_stats = "audio_s0" in b
    parts = []
    for seg in head_segments(head):
        if use_stats:
            if seg == "text":
                parts.append(("stats", b["text_gauss_s0"], b["text_gauss_s1"],
                              b["text_gauss_s2"]))
            else:
                parts.append(("stats", b[f"{seg}_s0"], b[f"{seg}_s1"],
                              b[f"{seg}_s2"]))
                if "pos_s0" in b:
                    pm = b["pos_mask"]
                    parts.append(("stats", b["pos_s0"] * pm, b["pos_s1"] * pm,
                                  b["pos_s2"] * pm))
        else:
            if seg == "text":
                parts.append(("raw", b["text_gauss"], b["text_gauss_mask"]))
            elif seg == "audio":
                parts.append(("raw", b["audio"], b["audio_mask"]))
                if "pos_table" in b:
                    parts.append(("raw", b["pos_table"], b["pos_mask"]))
            else:  # visual
                parts.append(("raw", b["visual"], b["visual_mask"]))
                if "pos_table" in b:
                    parts.append(("raw", b["pos_table"], b["pos_mask"]))
    return parts


def head_width(head: str, b) -> int:
    """Static mu/sigma column count of a head for this data dict (== the
    decoder head's output feature dim, incl. any positional channels)."""
    return sum(int(p[1].shape[-1]) for p in _head_parts(head, b))


def _head_log_prob(head: str, mu, sigma, b) -> jax.Array:
    """Masked Gaussian log-prob of one head, summed over its segments.

    Equivalent to the reference's Gaussian over torch.cat'ed data/masks
    (simplesif.py:93-113 + losses.py:251-256), since a diagonal Gaussian over
    a concatenation is the sum of diagonal Gaussians over the parts.

    When the data dict carries sufficient statistics (``<stream>_s0/s1/s2``,
    built by the prep pipeline), the quadratic-in-mu identity eliminates the
    sequence axis from the computation entirely — mathematically exact, a
    ~seq_len-fold VPU/bandwidth reduction (docs/DESIGN.md).
    """
    total = 0.0
    ofs = 0
    for part in _head_parts(head, b):
        f = part[1].shape[-1]
        mu_s = mu[:, ofs : ofs + f]
        sig_s = sigma[:, ofs : ofs + f]
        if part[0] == "stats":
            from mmtpu.ops.gaussian import gaussian_logpdf_suffstats

            total = total + gaussian_logpdf_suffstats(
                mu_s, sig_s, part[1], part[2], part[3]
            )
        else:
            total = total + gaussian_logpdf_masked(mu_s, sig_s, part[1], part[2])
        ofs += f
    return total


def joint_neg_log_prob_per_sample(
    decoder_params,
    lat: jax.Array,
    b: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: LatentFitSpec,
    row_valid: jax.Array | None = None,
) -> jax.Array:
    """Per-sample negative weighted joint log-likelihood ``(B,)``
    (losses.py:216-274) — shared by the latent fit and the e2e joint loss.

    Supports both decoder layouts: per-head pytrees and the stacked layout
    (one wide GEMM, mu/sigma sliced at the static per-head offsets — see
    ``mmtpu.models.decoder.stack_decoder``).
    """
    word_lp = _word_logprob(spec, lat, vocab_emb, b)
    heads = MMB1_HEADS if spec.unimodal else MMB2_HEADS
    if is_stacked(decoder_params):
        mu_all, sigma_all = apply_decoder_stacked(
            decoder_params, lat, hp["norm_code"], batch_weights=row_valid,
        )
        head_lp = []
        ofs = 0
        for h in heads:
            f = head_width(h, b)
            head_lp.append(_head_log_prob(
                h, mu_all[:, ofs:ofs + f], sigma_all[:, ofs:ofs + f], b))
            ofs += f
        # == without padding; < when the stacked table carries the fused
        # kernel's zero-pad tail (stack_decoder(pad_to=...))
        assert ofs <= mu_all.shape[-1], (ofs, mu_all.shape)
    else:
        out = apply_decoder(
            decoder_params, lat, hp["norm_code"], batch_weights=row_valid,
        )
        head_lp = [
            _head_log_prob(h, out[h]["mu"], out[h]["sigma"], b) for h in heads
        ]
    w = hp["word_loss_weight"]
    other = (1.0 - w) / len(head_lp)
    return -(sum(head_lp) * other + w * word_lp)  # losses.py:267-270


def batch_neg_log_prob(
    embed_batch: jax.Array,
    decoder_params,
    b: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: LatentFitSpec,
    row_valid: jax.Array | None = None,
) -> jax.Array:
    """Mean negative joint log-likelihood of one minibatch.

    Matches reference ``simplesif.py:129-133``; ``row_valid`` excludes padded
    rows from the mean (and from batch-norm statistics).
    """
    if spec.batch_shard_axis is not None:
        from jax.sharding import PartitionSpec as _P

        rows = _P(spec.batch_shard_axis)
        bsz = embed_batch.shape[0]
        embed_batch = jax.lax.with_sharding_constraint(embed_batch, rows)
        if row_valid is not None:
            row_valid = jax.lax.with_sharding_constraint(row_valid, rows)
        b = {
            k: (jax.lax.with_sharding_constraint(v, rows)
                if not k.startswith("pos_") and v.ndim >= 1
                and v.shape[0] == bsz else v)
            for k, v in b.items()
        }
    neg = joint_neg_log_prob_per_sample(
        decoder_params, embed_batch, b, vocab_emb, hp, spec, row_valid
    )
    if row_valid is None:
        return jnp.mean(neg)
    return jnp.sum(neg * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)


def train_view(data: Mapping[str, jax.Array]) -> dict:
    """Training-time view of a prepared data dict: when Gaussian sufficient
    statistics are present, the raw per-timestep streams (and their masks)
    are dropped so the hot loop never gathers them — the word-likelihood
    streams (text / text_weights / text_mask) are all that remain per-step.
    """
    if "audio_s0" not in data:
        return dict(data)
    drop = {
        "audio", "audio_mask", "visual", "visual_mask",
        "text_gauss", "text_gauss_mask", "pos_table",
    }
    return {k: v for k, v in data.items() if k not in drop}


def _gather_batch(data: Mapping[str, jax.Array], j: jax.Array) -> dict:
    """Index the per-utterance arrays; pass shared tables through."""
    shared = ("pos_table", "pos_mask", "pos_s0", "pos_s1", "pos_s2")
    return {k: (v if k in shared else v[j]) for k, v in data.items()}


def fit_latents(
    rng: jax.Array,
    init_embed: jax.Array,
    decoder_params,
    data: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: LatentFitSpec,
    validation=None,
):
    """Run the full latent fit.

    Returns ``(embed, decoder_params, losses)`` — or, when ``validation`` is
    given and ``spec.valid_every > 0``,
    ``(embed, decoder_params, losses, valid_losses)`` where ``valid_losses``
    holds the inner-fit final loss sampled at the validation cadence (entries
    between samples repeat the last value; one final validation is appended
    semantics-wise by sampling at the last epoch).

    ``losses`` is ``(n_epochs_max,)`` — per-epoch sums of batch means, the
    reference's accumulation (``simplesif.py:139-141``); entries at epochs
    ``>= hp["n_epochs"]`` are frozen at the last active value.

    hp keys (scalars; may carry a leading config axis under vmap):
        lr, word_loss_weight  — float
        opt_code              — OPT_SGD | OPT_ADAM
        norm_code             — NORM_NONE | NORM_LAYER | NORM_BATCH
        n_epochs              — int, actual epoch count (<= spec.n_epochs_max)

    Args:
        validation: optional ``(valid_init_embed, valid_data)`` — the valid
            split, refit from its SIF init with the CURRENT (frozen) decoder
            at each validation point, exactly the reference's recursive
            ``optimize_latents`` validation (``simplesif.py:146-159``).
    """
    inner_spec = None
    if validation is not None and spec.valid_every > 0:
        inner_spec = make_inner_valid_spec(spec, spec.valid_batch_mult)

    was_stacked = is_stacked(decoder_params)
    carry0 = init_fit_carry(rng, init_embed, decoder_params, spec)
    epoch_body = _make_epoch_body(
        data, vocab_emb, hp, spec, init_embed.shape[0], validation, inner_spec
    )
    if inner_spec is None:
        (embed, dec, _, _, _), losses = jax.lax.scan(
            epoch_body, carry0, jnp.arange(spec.n_epochs_max)
        )
        return embed, finish_fit_decoder(dec, data, spec, was_stacked), losses

    (embed, dec, _, _, key), (losses, valid_losses) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(spec.n_epochs_max)
    )
    # final validation (simplesif.py:153-159)
    fv = valid_fit_loss(key, validation, dec, vocab_emb, hp, inner_spec)
    valid_losses = jnp.concatenate([valid_losses, fv[None]])
    return (embed, finish_fit_decoder(dec, data, spec, was_stacked),
            losses, valid_losses)


def make_inner_valid_spec(spec, valid_batch_mult: int) -> "LatentFitSpec":
    """The spec of the recursive validation refit: frozen decoder, unshuffled,
    ``valid_batch_mult``× batch (simplesif.py:146-159 + the 8× valid loader
    at simplesif.py:458), and no nested validation.  Shared by the plain and
    e2e fits so the cadence semantics cannot drift."""
    return dataclasses.replace(
        spec,
        train_decoder=False,
        shuffle=False,
        batch_size=spec.batch_size * valid_batch_mult,
        valid_every=0,
    )


def valid_fit_loss(key, validation, dec, vocab_emb, hp, inner_spec):
    """One recursive-validation sample: refit the valid split from its SIF
    init against the frozen current decoder and return the final epoch's
    loss (simplesif.py:146-159)."""
    v_init, v_data = validation
    _, _, v_losses = fit_latents(key, v_init, dec, v_data, vocab_emb, hp,
                                 inner_spec)
    last_idx = jnp.clip(hp["n_epochs"] - 1, 0, inner_spec.n_epochs_max - 1)
    return v_losses[last_idx]


def init_fit_carry(rng, init_embed, decoder_params, spec: LatentFitSpec):
    """The scan carry of a latent fit: ``(embed, decoder, embed_opt_state,
    dec_opt_state, rng)``.  Exposed so host-side epoch-chunked fits
    (``mmtpu.train.chunked``) can checkpoint/restore mid-run.

    With ``spec.stacked_heads`` the decoder travels in the stacked layout
    (restored to the per-head pytree by :func:`finish_fit_decoder`)."""
    from mmtpu.train.optim import init_opt_state

    if ((spec.stacked_heads or spec.fused_dec_update)
            and not is_stacked(decoder_params)):
        from mmtpu.kernels.decoder_update import _F_TILE

        decoder_params, _ = stack_decoder(
            decoder_params, pad_to=_F_TILE if spec.fused_dec_update else 0)
    embed = jnp.asarray(init_embed, jnp.float32)
    embed_opt = init_opt_state(embed, spec.opt_kind)
    dec_opt = (
        init_opt_state(decoder_params, spec.opt_kind)
        if spec.train_decoder else None
    )
    return (embed, decoder_params, embed_opt, dec_opt, rng)


def finish_fit_decoder(dec, data, spec: LatentFitSpec, was_stacked: bool):
    """Restore the per-head decoder pytree after a fit whose carry used the
    stacked layout (no-op when the caller already passed stacked params).
    Slicing the true head widths also drops the fused path's zero-pad tail."""
    stacked_fit = spec.stacked_heads or spec.fused_dec_update
    if not (stacked_fit and is_stacked(dec)) or was_stacked:
        return dec
    heads = MMB1_HEADS if spec.unimodal else MMB2_HEADS
    return unstack_decoder(dec, [(h, head_width(h, data)) for h in heads])


def fit_latents_segment(
    carry,
    data: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: LatentFitSpec,
    epoch_start: jax.Array,
    n_seg: int,
):
    """Run epochs ``[epoch_start, epoch_start + n_seg)`` of a latent fit.

    Chaining segments from :func:`init_fit_carry` reproduces
    :func:`fit_latents` EXACTLY (same epoch indices, same rng threading —
    tested in tests/test_aux.py).  ``epoch_start`` is traced, so one compiled
    segment program serves every segment.  Validation-curve mode is not
    supported here (use the monolithic fit).

    Returns ``(carry, losses_segment)`` with ``losses_segment: (n_seg,)``.
    """
    epoch_body = _make_epoch_body(
        data, vocab_emb, hp, spec, carry[0].shape[0], None, None
    )
    return jax.lax.scan(
        epoch_body, carry, jnp.asarray(epoch_start) + jnp.arange(n_seg)
    )


def _make_epoch_body(data, vocab_emb, hp, spec: LatentFitSpec, n,
                     validation, inner_spec):
    """One training epoch as a ``lax.scan`` body over the epoch index."""
    from mmtpu.train.optim import (
        OptState,
        lazy_adam_catch_up,
        lazy_adam_coeffs,
        lazy_adam_epilogue,
        lazy_adam_touch,
        opt_update,
    )

    bsz = spec.batch_size
    n_batches = -(-n // bsz)
    pad = n_batches * bsz - n
    valid_flat = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )

    sparse_sgd = spec.opt_kind == "sgd"
    # static optimizer kinds run the epoch in PERMUTED space (see below);
    # the branchless runtime-code path keeps the classic dense layout
    perm_path = spec.opt_kind in ("sgd", "adam")
    # epoch-level lazy Adam: slice-only steps + one catch-up/epilogue pass
    # per epoch (optim.py "Epoch-level lazy Adam"); float-rounding-level
    # deltas vs the dense path, so opt-in (the sweep's bf16 fast path)
    lazy_adam = spec.opt_kind == "adam" and spec.lazy_adam

    def epoch_body(carry, epoch_idx):
        embed, dec, e_opt, d_opt, key = carry
        embed0, e_opt0 = embed, e_opt
        key, sub = jax.random.split(key)
        if spec.shuffle:
            perm = jax.random.permutation(sub, n)
        else:
            perm = jnp.arange(n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        idx = idx.reshape(n_batches, bsz)
        valid = valid_flat.reshape(n_batches, bsz)
        active = epoch_idx < hp["n_epochs"]

        # Epoch-contiguous sparse path: the minibatches ARE the reshaped
        # permutation, so permute the table ONCE per epoch and make every
        # step a contiguous dynamic slice / dynamic-update-slice.  The
        # per-step scatter-add (`embed.at[j].add`) forced XLA into two
        # full-table layout transposes per step — ~17% of sweep-chunk
        # execution (profiled; see docs/DESIGN.md).  Each row occurs in
        # exactly one batch per epoch, and the old path gathered a row's
        # pre-epoch value anyway, so the math is identical (pad rows are
        # duplicates of row 0 with exactly-zero gradients, dropped at the
        # un-permute).
        if perm_path:
            flat = idx.reshape(-1)
            embp = embed[flat]
            starts = jnp.arange(n_batches, dtype=jnp.int32) * bsz
            e_opt_in = e_opt
            if spec.opt_kind == "adam":
                # Adam's per-row moment tables permute WITH the rows; the
                # dense-grad table then builds via a contiguous
                # dynamic-update-slice instead of a scatter — the scatter's
                # gather-transpose forced ~35% of an Adam chunk's device
                # time into full-table layout copies (profiled)
                e_opt_in = OptState(
                    m=e_opt.m[flat], v=e_opt.v[flat], count=e_opt.count
                )
        else:
            embp = embed
            starts = jnp.zeros((n_batches,), jnp.int32)
            e_opt_in = e_opt

        coeffs = (
            lazy_adam_coeffs(e_opt.count, n_batches, hp["lr"])
            if lazy_adam else None
        )

        # Block streaming: in the sparse-SGD and lazy-Adam modes each row
        # block is read and written by exactly one step, so the blocks flow
        # through the scan as stacked inputs (xs) and outputs (ys) instead
        # of a carried table updated by dynamic-update-slice.  A carried
        # table forced XLA to double-buffer it — profiled at ~5 full-table
        # copies per step ("data formatting", 27% of an Adam chunk) that an
        # in-carry update-slice formulation did NOT remove.  ys buffers are
        # written once per step by construction — no aliasing analysis
        # required.  The reshape IS the batch structure: block s == rows
        # [s·B, (s+1)·B) of the permuted table.
        stream = sparse_sgd or lazy_adam
        Dd = embp.shape[1]
        xs = (idx, valid, starts)
        if stream:
            xs = xs + (embp.reshape(n_batches, bsz, Dd),)
            if lazy_adam:
                xs = xs + (e_opt_in.m.reshape(n_batches, bsz, Dd),
                           e_opt_in.v.reshape(n_batches, bsz, Dd))

        def batch_body(bcarry, xs_t):
            embed, dec, e_opt, d_opt = bcarry
            if lazy_adam:
                j, row_valid, start, p0, m0, v0 = xs_t
            elif sparse_sgd:
                j, row_valid, start, p0 = xs_t
            else:
                j, row_valid, start = xs_t
            b = _gather_batch(data, j)

            def loss_fn(embed_arg, dec_params):
                rows = embed_arg if perm_path else embed_arg[j]
                return batch_neg_log_prob(
                    rows, dec_params, b, vocab_emb, hp, spec, row_valid
                )

            if lazy_adam:
                # the block is s pending zero-grad steps behind — catch it
                # up in-register before the forward pass
                s_step = start // bsz
                embed_arg, m_s, v_s = lazy_adam_catch_up(
                    p0, m0, v0, s_step, coeffs
                )
            elif sparse_sgd:
                embed_arg = p0
            else:
                embed_arg = (
                    jax.lax.dynamic_slice_in_dim(embed, start, bsz)
                    if perm_path else embed
                )
            if spec.train_decoder and spec.fused_dec_update:
                from mmtpu.train.fused import fused_joint_step

                # plain-fit freeze semantics: train_dec gates the WHOLE
                # decoder, norm included (simplesif.py:55-56)
                gate = hp["train_dec"] if "train_dec" in hp else 1.0
                loss, g_embed, _, dec2, d_opt2 = fused_joint_step(
                    dec, d_opt, embed_arg, b, vocab_emb, hp, spec,
                    row_valid, active, heads_gate=gate, norm_gate=gate,
                )
            elif spec.train_decoder:
                loss, (g_embed, g_dec) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    embed_arg, dec
                )
                # per-config freeze_weights: hp["train_dec"]=0 freezes the
                # WHOLE decoder (heads + norm), matching the non-e2e reference
                # where frozen decoders never enter the optimizer
                # (simplesif.py:55-56) — used by the vmapped sweep, where
                # train_decoder must stay a shared static
                dec_gates = (
                    jax.tree.map(lambda _: hp["train_dec"], dec)
                    if "train_dec" in hp else None
                )
                dec2, d_opt2 = opt_update(
                    dec, g_dec, d_opt, hp["lr"], hp["opt_code"], active,
                    kind=spec.opt_kind, gates=dec_gates,
                )
            else:
                loss, g_embed = jax.value_and_grad(loss_fn)(embed_arg, dec)
                dec2, d_opt2 = dec, d_opt
            if sparse_sgd:
                act = jnp.asarray(active, jnp.float32)
                p2 = embed_arg - hp["lr"] * act * g_embed
                return (embed, dec2, e_opt, d_opt2), (loss, p2)
            if lazy_adam:
                # inactive epochs are discarded wholesale at epoch end (the
                # dense path gates per step)
                p2, m2, v2 = lazy_adam_touch(
                    embed_arg, m_s, v_s, g_embed, s_step, hp["lr"], coeffs
                )
                return (embed, dec2, e_opt, d_opt2), (loss, p2, m2, v2)
            if perm_path:  # adam in permuted space: contiguous dense grad
                # (an implicit-zero 4-pass variant — decay-only dense pass
                # + slice update-slices — measured 22% SLOWER on-chip;
                # docs/DESIGN.md "measured negatives")
                g_embed = jax.lax.dynamic_update_slice_in_dim(
                    jnp.zeros_like(embed), g_embed, start, 0
                )
            embed2, e_opt2 = opt_update(
                embed, g_embed, e_opt, hp["lr"], hp["opt_code"], active,
                kind=spec.opt_kind,
            )
            return (embed2, dec2, e_opt2, d_opt2), loss

        (emb_out, dec, e_opt, d_opt), ys = jax.lax.scan(
            batch_body, (embp, dec, e_opt_in, d_opt), xs,
            unroll=spec.unroll,
        )
        if stream:
            batch_losses = ys[0]
            emb_out = ys[1].reshape(n_batches * bsz, Dd)
        else:
            batch_losses = ys
        if lazy_adam:
            # every block's remaining zero-grad steps, one full-table pass
            emb_out, m_l, v_l = lazy_adam_epilogue(
                emb_out, ys[2].reshape(n_batches * bsz, Dd),
                ys[3].reshape(n_batches * bsz, Dd),
                n_batches, bsz, hp["lr"], coeffs,
            )
            e_opt = OptState(m=m_l, v=v_l, count=e_opt.count)
        if perm_path:
            # un-permute rows (and Adam's moment tables) once per epoch;
            # inverse permutation via argsort (a vmapped int scatter here
            # crashes the TPU compiler's scatter emitter; sort lowers fine);
            # pad duplicates are simply dropped
            inv = jnp.argsort(perm)
            embed = emb_out[:n][inv]
            if spec.opt_kind == "adam":
                e_opt = OptState(
                    m=e_opt.m[:n][inv], v=e_opt.v[:n][inv], count=e_opt.count
                )
        else:
            embed = emb_out
        if lazy_adam:
            # inactive-epoch gating, once per epoch (the dense path gates
            # inside every opt_update)
            embed = jnp.where(active, embed, embed0)
            e_opt = OptState(
                m=jnp.where(active, e_opt.m, e_opt0.m),
                v=jnp.where(active, e_opt.v, e_opt0.v),
                count=jnp.where(
                    active, e_opt0.count + n_batches, e_opt0.count
                ),
            )
        epoch_loss = jnp.sum(batch_losses)

        if inner_spec is None:
            return (embed, dec, e_opt, d_opt, key), epoch_loss

        # recursive validation: refit valid latents against the frozen
        # current decoder (full inner fit — reference simplesif.py:146-151)
        key, v_key = jax.random.split(key)
        do_valid = jnp.logical_and(active, epoch_idx % spec.valid_every == 0)
        v_loss = jax.lax.cond(
            do_valid,
            lambda: valid_fit_loss(v_key, validation, dec, vocab_emb, hp,
                                   inner_spec),
            lambda: jnp.float32(jnp.nan),
        )
        return (embed, dec, e_opt, d_opt, key), (epoch_loss, v_loss)

    return epoch_body

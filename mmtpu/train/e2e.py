"""End-to-end (e2e) training: joint likelihood + supervised L1 objective.

TPU-native equivalent of the reference's e2e branch (``simplesif.py:625-912``,
the shipped sweep default ``e2e=True`` at ``make_configs.py:29``): one
optimizer over {train embeddings, decoder, sentiment MLP} minimizing

    likelihood_weight * (-log p) + (1 - likelihood_weight) * L1(sentiment)

per sample (``simplesif.py:786``), with optional semi-supervised masking that
zeroes the sentiment term for unlabeled indices (``simplesif.py:779-784`` —
note the reference divides by the full batch size, not the labeled count;
reproduced).  Valid/test latents are still fit likelihood-only via
:func:`mmtpu.train.latents.fit_latents` (``simplesif.py:803-806``).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from mmtpu.models.sentiment import apply_sentiment
from mmtpu.train.latents import LatentFitSpec, _gather_batch
from mmtpu.train.optim import OptState, init_opt_state, opt_update


@dataclasses.dataclass(frozen=True)
class E2EFitSpec:
    n_epochs_max: int
    batch_size: int  # the multimodal loader's batch (cfg.batch_size, simplesif.py:457)
    unimodal: bool
    word_metric: str = "angular"
    shuffle: bool = True
    a: float = 1e-3
    partition_fn: object = None
    unroll: int = 1
    opt_kind: str | None = None  # static optimizer kind (see LatentFitSpec)
    # recursive validation cadence: every valid_every epochs, refit the valid
    # split likelihood-only against the frozen current decoder — the e2e
    # branch uses the same valid_niter*8 = 80 cadence as the non-e2e path
    # (simplesif.py:795-799); 0 disables
    valid_every: int = 0
    valid_batch_mult: int = 8
    # mesh axis name to shard each minibatch's rows across (GSPMD; see
    # mmtpu/parallel/fit.py) — None = single-device
    batch_shard_axis: str | None = None
    # stacked decoder layout (one wide GEMM per step — see LatentFitSpec;
    # default off: measured slower on the sweep, scripts/diag_stacked.py)
    stacked_heads: bool = False
    # epoch-level lazy Adam (see LatentFitSpec.lazy_adam / optim.py) —
    # default off; the bf16 sweep fast path opts in
    lazy_adam: bool = False
    # fused decoder update (see LatentFitSpec.fused_dec_update /
    # mmtpu/kernels/decoder_update.py) — default off pending on-chip A/B
    fused_dec_update: bool = False

    def latent_spec(self) -> LatentFitSpec:
        return LatentFitSpec(
            n_epochs_max=self.n_epochs_max,
            batch_size=self.batch_size,
            train_decoder=True,
            unimodal=self.unimodal,
            word_metric=self.word_metric,
            shuffle=self.shuffle,
            a=self.a,
            partition_fn=self.partition_fn,
            unroll=self.unroll,
            opt_kind=self.opt_kind,
            batch_shard_axis=self.batch_shard_axis,
            stacked_heads=self.stacked_heads,
            lazy_adam=self.lazy_adam,
            fused_dec_update=self.fused_dec_update,
        )


def fit_e2e(
    rng: jax.Array,
    init_embed: jax.Array,
    decoder_params,
    senti_params,
    data: Mapping[str, jax.Array],
    labels: jax.Array,
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: E2EFitSpec,
    senti_mask: Optional[jax.Array] = None,
    validation=None,
):
    """Joint fit.  Returns ``(embed, decoder_params, senti_params, losses)``
    — plus ``valid_losses`` when ``validation=(valid_init, valid_data)`` and
    ``spec.valid_every > 0`` (the reference's recursive likelihood-only
    validation fit, simplesif.py:795-799; NaN between sampling points, one
    final sample appended).

    hp keys: as :func:`fit_latents` plus ``likelihood_weight``.
    ``senti_mask`` is the per-utterance 0/1 labeled mask (semi-supervised);
    None = fully supervised.
    """
    from mmtpu.train.latents import make_inner_valid_spec, valid_fit_loss

    lspec = spec.latent_spec()
    inner_spec = None
    if validation is not None and spec.valid_every > 0:
        inner_spec = make_inner_valid_spec(
            spec.latent_spec(), spec.valid_batch_mult
        )
    n = init_embed.shape[0]
    bsz = spec.batch_size
    n_batches = -(-n // bsz)
    pad = n_batches * bsz - n

    from mmtpu.models.decoder import is_stacked, stack_decoder

    was_stacked = is_stacked(decoder_params)
    if (spec.stacked_heads or spec.fused_dec_update) and not was_stacked:
        from mmtpu.kernels.decoder_update import _F_TILE

        decoder_params, _ = stack_decoder(
            decoder_params, pad_to=_F_TILE if spec.fused_dec_update else 0)

    embed = jnp.asarray(init_embed, jnp.float32)
    e_opt = init_opt_state(embed, spec.opt_kind)
    d_opt = init_opt_state(decoder_params, spec.opt_kind)
    s_opt = init_opt_state(senti_params, spec.opt_kind)

    valid_flat = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )

    sparse_sgd = spec.opt_kind == "sgd"
    perm_path = spec.opt_kind in ("sgd", "adam")  # see mmtpu/train/latents.py
    lazy_adam = spec.opt_kind == "adam" and spec.lazy_adam

    from mmtpu.train.optim import (
        lazy_adam_catch_up,
        lazy_adam_coeffs,
        lazy_adam_epilogue,
        lazy_adam_touch,
    )

    def epoch_body(carry, epoch_idx):
        embed, dec, sen, e_opt, d_opt, s_opt, key = carry
        embed0, e_opt0 = embed, e_opt
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n) if spec.shuffle else jnp.arange(n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        idx = idx.reshape(n_batches, bsz)
        valid = valid_flat.reshape(n_batches, bsz)
        active = epoch_idx < hp["n_epochs"]

        # epoch-contiguous sparse path: permute the table once per epoch,
        # make each step a contiguous slice/update-slice (identical math —
        # see the profiled rationale in mmtpu/train/latents.py)
        if perm_path:
            flat = idx.reshape(-1)
            embp = embed[flat]
            starts = jnp.arange(n_batches, dtype=jnp.int32) * bsz
            e_opt_in = e_opt
            if spec.opt_kind == "adam":
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

        # block streaming (see mmtpu/train/latents.py): sparse-SGD and
        # lazy-Adam blocks flow as scan xs/ys instead of a carried table —
        # a carried table is double-buffered by XLA (~5 full-table copies
        # per step, profiled)
        stream = sparse_sgd or lazy_adam
        Dd = embp.shape[1]
        xs = (idx, valid, starts)
        if stream:
            xs = xs + (embp.reshape(n_batches, bsz, Dd),)
            if lazy_adam:
                xs = xs + (e_opt_in.m.reshape(n_batches, bsz, Dd),
                           e_opt_in.v.reshape(n_batches, bsz, Dd))

        def batch_body(bcarry, xs_t):
            embed, dec, sen, e_opt, d_opt, s_opt = bcarry
            if lazy_adam:
                j, row_valid, start, p0, m0, v0 = xs_t
            elif sparse_sgd:
                j, row_valid, start, p0 = xs_t
            else:
                j, row_valid, start = xs_t
            b = _gather_batch(data, j)
            y = labels[j]
            csh = None
            if spec.batch_shard_axis is not None:
                # split the minibatch's rows across the mesh axis; XLA
                # inserts the gradient psums (see mmtpu/parallel/fit.py)
                from jax.sharding import PartitionSpec as _P

                rows = _P(spec.batch_shard_axis)
                csh = lambda t: jax.lax.with_sharding_constraint(t, rows)
                row_valid = csh(row_valid)
                y = csh(y)
                b = {
                    k: (csh(v) if not k.startswith("pos_") and v.ndim >= 1
                        and v.shape[0] == bsz else v)
                    for k, v in b.items()
                }
            def loss_fn(embed_arg, dec_p, sen_p):
                lat = embed_arg if perm_path else embed_arg[j]
                if csh is not None:
                    lat = csh(lat)
                # per-sample -(weighted joint log p), shared with the latent
                # fit (handles both decoder layouts)
                from mmtpu.train.latents import joint_neg_log_prob_per_sample

                log_prob = joint_neg_log_prob_per_sample(
                    dec_p, lat, b, vocab_emb, hp, lspec, row_valid
                )  # (B,)

                pred = apply_sentiment(sen_p, lat)
                err = jnp.abs(pred - y)
                if senti_mask is not None:
                    # zero unlabeled samples BEFORE the mean (simplesif.py:779-784)
                    m = senti_mask[j]
                    if csh is not None:
                        m = csh(m)
                    err = err * (m if err.ndim == m.ndim else m[..., None])
                if err.ndim > 1:
                    err = jnp.mean(err, axis=tuple(range(1, err.ndim)))
                lw = hp["likelihood_weight"]
                loss = lw * log_prob + (1.0 - lw) * err  # (B,)  simplesif.py:786
                return jnp.sum(loss * row_valid) / jnp.maximum(
                    jnp.sum(row_valid), 1.0
                )

            if lazy_adam:
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
            if spec.fused_dec_update:
                from mmtpu.train.fused import fused_joint_step

                def senti_term(sen_p, neg, lat):
                    # lw·(−log p) + (1−lw)·L1, per sample (simplesif.py:786)
                    pred = apply_sentiment(sen_p, lat)
                    err = jnp.abs(pred - y)
                    if senti_mask is not None:
                        m_ = senti_mask[j]
                        err = err * (m_ if err.ndim == m_.ndim else m_[..., None])
                    if err.ndim > 1:
                        err = jnp.mean(err, axis=tuple(range(1, err.ndim)))
                    lw = hp["likelihood_weight"]
                    return lw * neg + (1.0 - lw) * err

                # e2e freeze semantics: train_heads gates the generator
                # heads only; the norm affine stays trainable
                # (simplesif.py:689-691, models.py:170-178)
                hgate = hp["train_heads"] if "train_heads" in hp else 1.0
                loss, ge, gs, dec2, d_opt2 = fused_joint_step(
                    dec, d_opt, embed_arg, b, vocab_emb, hp, lspec,
                    row_valid, active, heads_gate=hgate, norm_gate=1.0,
                    extra_params=sen, combine=senti_term,
                )
                gd = None
            else:
                loss, (ge, gd, gs) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2))(embed_arg, dec, sen)
            emb_ys = None
            if sparse_sgd:
                act = jnp.asarray(active, jnp.float32)
                emb_ys = (embed_arg - hp["lr"] * act * ge,)
                embed2, e_opt2 = embed, e_opt
            elif lazy_adam:
                emb_ys = lazy_adam_touch(
                    embed_arg, m_s, v_s, ge, s_step, hp["lr"], coeffs
                )
                embed2, e_opt2 = embed, e_opt
            else:
                if perm_path:  # adam in permuted space: contiguous dense grad
                    # (implicit-zero sliced variant measured slower on-chip —
                    # see mmtpu/train/latents.py + docs/DESIGN.md)
                    ge = jax.lax.dynamic_update_slice_in_dim(
                        jnp.zeros_like(embed), ge, start, 0
                    )
                embed2, e_opt2 = opt_update(
                    embed, ge, e_opt, hp["lr"], hp["opt_code"], active,
                    kind=spec.opt_kind,
                )
            # freeze_weights in e2e mode freezes ONLY the generator heads —
            # the norm's affine params stay trainable, because the reference
            # adds all gen_model.parameters() to the optimizer but
            # freeze_weights() detaches just the embed2out linears
            # (simplesif.py:689-691, models.py:170-178)
            if not spec.fused_dec_update:
                dec_gates = None
                if "train_heads" in hp:
                    th = hp["train_heads"]
                    dec_gates = {
                        "heads": jax.tree.map(lambda _: th, dec["heads"]),
                        "norm": jax.tree.map(lambda _: jnp.float32(1.0),
                                             dec["norm"]),
                    }
                dec2, d_opt2 = opt_update(dec, gd, d_opt, hp["lr"],
                                          hp["opt_code"], active,
                                          kind=spec.opt_kind, gates=dec_gates)
            sen2, s_opt2 = opt_update(sen, gs, s_opt, hp["lr"], hp["opt_code"],
                                      active, kind=spec.opt_kind)
            ys = loss if emb_ys is None else (loss,) + emb_ys
            return (embed2, dec2, sen2, e_opt2, d_opt2, s_opt2), ys

        (emb_out, dec, sen, e_opt, d_opt, s_opt), ys = jax.lax.scan(
            batch_body,
            (embp, dec, sen, e_opt_in, d_opt, s_opt),
            xs,
            unroll=spec.unroll,
        )
        if stream:
            batch_losses = ys[0]
            emb_out = ys[1].reshape(n_batches * bsz, Dd)
        else:
            batch_losses = ys
        if lazy_adam:
            emb_out, m_l, v_l = lazy_adam_epilogue(
                emb_out, ys[2].reshape(n_batches * bsz, Dd),
                ys[3].reshape(n_batches * bsz, Dd),
                n_batches, bsz, hp["lr"], coeffs,
            )
            e_opt = OptState(m=m_l, v=v_l, count=e_opt.count)
        if perm_path:
            # inverse permutation via argsort (a vmapped int scatter here
            # crashes the TPU compiler's scatter emitter; sort lowers fine)
            inv = jnp.argsort(perm)
            embed = emb_out[:n][inv]
            if spec.opt_kind == "adam":
                e_opt = OptState(
                    m=e_opt.m[:n][inv], v=e_opt.v[:n][inv], count=e_opt.count
                )
        else:
            embed = emb_out
        if lazy_adam:
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
            return (embed, dec, sen, e_opt, d_opt, s_opt, key), epoch_loss

        # recursive validation against the frozen current decoder
        # (simplesif.py:795-799)
        key, v_key = jax.random.split(key)
        do_valid = jnp.logical_and(active, epoch_idx % spec.valid_every == 0)
        v_loss = jax.lax.cond(
            do_valid,
            lambda: valid_fit_loss(v_key, validation, dec, vocab_emb, hp,
                                   inner_spec),
            lambda: jnp.float32(jnp.nan),
        )
        return (embed, dec, sen, e_opt, d_opt, s_opt, key), (epoch_loss, v_loss)

    from mmtpu.train.latents import finish_fit_decoder

    carry0 = (embed, decoder_params, senti_params, e_opt, d_opt, s_opt, rng)
    if inner_spec is None:
        (embed, dec, sen, _, _, _, _), losses = jax.lax.scan(
            epoch_body, carry0, jnp.arange(spec.n_epochs_max)
        )
        return (embed, finish_fit_decoder(dec, data, lspec, was_stacked),
                sen, losses)

    (embed, dec, sen, _, _, _, key), (losses, valid_losses) = jax.lax.scan(
        epoch_body, carry0, jnp.arange(spec.n_epochs_max)
    )
    fv = valid_fit_loss(key, validation, dec, vocab_emb, hp, inner_spec)
    valid_losses = jnp.concatenate([valid_losses, fv[None]])
    return (embed, finish_fit_decoder(dec, data, lspec, was_stacked),
            sen, losses, valid_losses)

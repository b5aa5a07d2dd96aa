"""Downstream sentiment/trait training with early stopping + lr decay.

TPU-native equivalent of reference ``sentiment_model.py:76-163``
(``train_sentiment``): L1 loss, SGD (the sentiment path is always SGD,
``sentiment_model.py:91``), batch 32 shuffled, validation every 10 epochs,
optional early stopping with patience 10, up to 3 lr-decay trials that reload
the best checkpoint (``sentiment_model.py:132-160``).

The whole state machine — including best-checkpoint snapshots and lr decay —
runs inside one jitted ``lax.scan``, so a vmapped sweep trains all configs'
sentiment heads simultaneously.

Parity note: with early stopping the reference's *final* "reload best" loads
into a freshly constructed local ``model`` but evaluates the trained-through
``senti_model`` (``sentiment_model.py:243-250``), so the final evaluation uses
the LAST parameters (mid-training reloads do apply).  We reproduce that:
:func:`fit_sentiment` returns the last parameters, and additionally returns
the best snapshot for callers who want the evidently intended behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SentimentFitSpec:
    n_epochs_max: int
    batch_size: int = 32  # sentiment_model.py:203
    early_stopping: bool = False  # CLI --early_stopping (simplesif.py:197)
    valid_niter: int = 10  # sentiment_model.py:77
    patience: int = 10  # sentiment_model.py:86
    n_trials: int = 3  # sentiment_model.py:87
    shuffle: bool = True
    unroll: int = 1


def _batched_index(n: int, bsz: int, perm: jax.Array):
    n_batches = -(-n // bsz)
    pad = n_batches * bsz - n
    idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    return idx.reshape(n_batches, bsz), valid.reshape(n_batches, bsz)


def _l1_batch_mean(pred, y, row_valid):
    """Mean L1 over a padded batch == reference's ``loss.mean()`` on the
    unpadded batch (L1 is elementwise; multi-output targets average over the
    output dim too, matching ``nn.L1Loss(reduce=False)...mean()``)."""
    err = jnp.abs(pred - y)
    if err.ndim > 1:
        err = jnp.mean(err, axis=tuple(range(1, err.ndim)))
    return jnp.sum(err * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)


def eval_sentiment_loss(params, latents, y, bsz: int = 32):
    """Mean-of-batch-means validation loss (sentiment_model.py:115-125)."""
    from mmtpu.models.sentiment import apply_sentiment

    n = latents.shape[0]
    idx, valid = _batched_index(n, bsz, jnp.arange(n))

    def body(_, xs):
        j, rv = xs
        pred = apply_sentiment(params, latents[j])
        return None, _l1_batch_mean(pred, y[j], rv)

    _, losses = jax.lax.scan(body, None, (idx, valid))
    return jnp.mean(losses)


def fit_sentiment(
    rng: jax.Array,
    params,
    train_latents: jax.Array,
    train_y: jax.Array,
    valid_latents: jax.Array,
    valid_y: jax.Array,
    hp: Mapping[str, jax.Array],
    spec: SentimentFitSpec,
):
    """Train the sentiment MLP.  Returns
    ``(last_params, best_params, train_losses, valid_losses)``.

    hp keys: ``lr`` (sentiment_lr), ``lr_decay``, ``n_epochs``.
    ``train_losses`` is per-epoch mean-of-batch-means
    (``sentiment_model.py:112``); ``valid_losses`` is sampled every
    ``valid_niter`` epochs (frozen in between).
    """
    from mmtpu.models.sentiment import apply_sentiment

    n = train_latents.shape[0]
    bsz = spec.batch_size

    def epoch_body(carry, epoch_idx):
        (params, best, lr, valid_min, n_bad, trials, stopped, key) = carry
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n) if spec.shuffle else jnp.arange(n)
        idx, valid = _batched_index(n, bsz, perm)
        active = jnp.logical_and(epoch_idx < hp["n_epochs"], ~stopped)

        # latents/labels are fixed during this fit, so gather the epoch's
        # permutation ONCE and slice contiguously per step (identical math;
        # removes a per-step gather — profiled in docs/DESIGN.md)
        flat = idx.reshape(-1)
        lat_p = train_latents[flat]
        y_p = train_y[flat]
        n_b = idx.shape[0]
        starts = jnp.arange(n_b, dtype=jnp.int32) * bsz

        def batch_body(p, xs):
            rv, start = xs
            lat = jax.lax.dynamic_slice_in_dim(lat_p, start, bsz)
            y = jax.lax.dynamic_slice_in_dim(y_p, start, bsz)

            def loss_fn(p):
                pred = apply_sentiment(p, lat)
                return _l1_batch_mean(pred, y, rv)

            loss, g = jax.value_and_grad(loss_fn)(p)
            p2 = jax.tree.map(lambda a, ga: a - lr * ga, p, g)
            p2 = jax.tree.map(lambda a, b: jnp.where(active, a, b), p2, p)
            return p2, loss

        params, batch_losses = jax.lax.scan(batch_body, params,
                                            (valid, starts),
                                            unroll=spec.unroll)
        train_loss = jnp.mean(batch_losses)

        # --- validation / early-stopping state machine, every valid_niter ---
        do_valid = jnp.logical_and(active, epoch_idx % spec.valid_niter == 0)
        vloss = jax.lax.cond(
            do_valid,
            lambda: eval_sentiment_loss(params, valid_latents, valid_y, bsz),
            lambda: valid_min,
        )
        is_better = vloss < valid_min
        valid_min2 = jnp.where(do_valid & is_better, vloss, valid_min)

        if spec.early_stopping:
            take_best = do_valid & is_better
            best2 = jax.tree.map(
                lambda b, p: jnp.where(take_best, p, b), best, params
            )
            n_bad2 = jnp.where(
                do_valid, jnp.where(is_better, 0, n_bad + 1), n_bad
            )
            exhausted = n_bad2 >= spec.patience
            trials2 = jnp.where(do_valid & exhausted, trials + 1, trials)
            retry = do_valid & exhausted & (trials2 < spec.n_trials)
            stop2 = stopped | (do_valid & exhausted & (trials2 >= spec.n_trials))
            # reload best + decay lr on retry (sentiment_model.py:146-157)
            params = jax.tree.map(
                lambda p, b: jnp.where(retry, b, p), params, best2
            )
            lr2 = jnp.where(retry, lr * hp["lr_decay"], lr)
            n_bad3 = jnp.where(retry, 0, n_bad2)
            carry2 = (params, best2, lr2, valid_min2, n_bad3, trials2, stop2, key)
        else:
            carry2 = (params, best, lr, valid_min2, n_bad, trials, stopped, key)
        return carry2, (train_loss, vloss)

    init = (
        params,
        params,
        jnp.asarray(hp["lr"], jnp.float32),
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        rng,
    )
    (params, best, _, _, _, _, _, _), (train_losses, valid_losses) = jax.lax.scan(
        epoch_body, init, jnp.arange(spec.n_epochs_max)
    )
    return params, best, train_losses, valid_losses

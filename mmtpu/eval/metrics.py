"""Device-side evaluation metrics — jit/vmap-safe, sklearn-free.

TPU-native equivalents of the metric computations in reference
``losses.py:276-366`` (``full_loss`` / ``iemocap_loss`` / ``pom_loss``), so an
entire vmapped sweep can be scored on device without host round-trips.
Golden-tested against sklearn in ``tests/test_data_config_eval.py``.

Note a reference quirk preserved deliberately: ``full_loss`` calls
``f1_score(np.round(predictions), np.round(y_test), average='weighted')`` —
i.e. the *predictions* occupy sklearn's ``y_true`` slot (``losses.py:291``),
which changes the support weighting.  :func:`mosi_metrics` reproduces that
argument order; :func:`weighted_f1` itself is order-honest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Rounded-class bin range for F1/accuracy metrics.  MOSI labels live in
# [-3, 3]; POM traits in ~[1, 7]; predictions can stray, so the range is wide.
# Classes outside contribute zero support in sklearn and are clipped here —
# golden tests confirm equivalence on realistic values.
_BIN_LO, _BIN_HI = -20, 20


def mae(pred: jax.Array, y: jax.Array) -> jax.Array:
    """losses.py:285 — mean absolute error over flattened arrays."""
    return jnp.mean(jnp.abs(pred.reshape(-1) - y.reshape(-1)))


def pearson_corr(pred: jax.Array, y: jax.Array) -> jax.Array:
    """losses.py:287 — Pearson correlation coefficient."""
    p = pred.reshape(-1)
    t = y.reshape(-1)
    pc = p - jnp.mean(p)
    tc = t - jnp.mean(t)
    denom = jnp.sqrt(jnp.sum(pc * pc) * jnp.sum(tc * tc))
    return jnp.sum(pc * tc) / denom


def mult_acc(pred: jax.Array, y: jax.Array) -> jax.Array:
    """losses.py:289 — fraction of matching rounded values (np.round is
    round-half-to-even; so is jnp.round)."""
    return jnp.mean(
        (jnp.round(pred.reshape(-1)) == jnp.round(y.reshape(-1))).astype(jnp.float32)
    )


def _class_counts(labels: jax.Array) -> jax.Array:
    """Histogram of integer labels over the fixed bin range."""
    n_bins = _BIN_HI - _BIN_LO + 1
    shifted = jnp.clip(labels - _BIN_LO, 0, n_bins - 1).astype(jnp.int32)
    return jnp.zeros((n_bins,), jnp.float32).at[shifted].add(1.0)


def weighted_f1(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """sklearn ``f1_score(y_true, y_pred, average='weighted')`` over rounded
    integer classes (vectorized one-hot formulation, no host sync)."""
    t = jnp.round(y_true.reshape(-1))
    p = jnp.round(y_pred.reshape(-1))
    true_c = _class_counts(t)
    pred_c = _class_counts(p)
    n_bins = _BIN_HI - _BIN_LO + 1
    shifted = jnp.clip(t - _BIN_LO, 0, n_bins - 1).astype(jnp.int32)
    tp = (
        jnp.zeros((n_bins,), jnp.float32)
        .at[shifted]
        .add((t == p).astype(jnp.float32))
    )
    precision = jnp.where(pred_c > 0, tp / jnp.maximum(pred_c, 1.0), 0.0)
    recall = jnp.where(true_c > 0, tp / jnp.maximum(true_c, 1.0), 0.0)
    f1 = jnp.where(
        precision + recall > 0,
        2.0 * precision * recall / jnp.maximum(precision + recall, 1e-30),
        0.0,
    )
    return jnp.sum(f1 * true_c) / jnp.maximum(jnp.sum(true_c), 1.0)


def binary_accuracy(pred: jax.Array, y: jax.Array) -> jax.Array:
    """losses.py:294-296 — accuracy of the (value >= 0) binarization."""
    return jnp.mean(
        ((pred.reshape(-1) >= 0) == (y.reshape(-1) >= 0)).astype(jnp.float32)
    )


def mosi_metrics(pred: jax.Array, y: jax.Array) -> dict:
    """Device-side core of reference ``full_loss`` (losses.py:276-315).

    Returns mae / corr / mult_acc / f_score / accuracy as scalars.  f_score
    reproduces the reference's swapped argument order (predictions in the
    y_true slot).
    """
    return {
        "mae": mae(pred, y),
        "corr": pearson_corr(pred, y),
        "mult_acc": mult_acc(pred, y),
        "f_score": weighted_f1(pred, y),  # sic — reference order losses.py:291
        "accuracy": binary_accuracy(pred, y),
    }


def iemocap_metrics(pred: jax.Array, y: jax.Array) -> dict:
    """Device-side core of ``iemocap_loss`` (losses.py:317-340): argmax
    accuracy + weighted F1 over class indices."""
    t = jnp.argmax(y, axis=1).astype(jnp.float32)
    p = jnp.argmax(pred, axis=1).astype(jnp.float32)
    return {
        "accuracy": jnp.mean((t == p).astype(jnp.float32)),
        "f_score": weighted_f1(t, p),
    }


def pom_metrics(pred: jax.Array, y: jax.Array) -> dict:
    """Device-side core of ``pom_loss`` (losses.py:342-366): per-trait vectors
    of mae / corr / mult_acc / f_score (shape = (n_traits,))."""
    per_trait_f1 = jax.vmap(lambda p, t: weighted_f1(p, t), in_axes=(1, 1))
    return {
        "mae": jnp.mean(jnp.abs(pred - y), axis=0),
        "corr": jax.vmap(pearson_corr, in_axes=(1, 1))(pred, y),
        "mult_acc": jnp.mean(
            (jnp.round(pred) == jnp.round(y)).astype(jnp.float32), axis=0
        ),
        # sic — reference passes predictions first (losses.py:353-356)
        "f_score": per_trait_f1(pred, y),
    }

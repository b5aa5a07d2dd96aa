"""Masked diagonal-Gaussian log-likelihood op.

TPU-native equivalent of reference ``losses.py:13-33`` (``get_normal_log_prob``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_logpdf_masked(
    mu: jax.Array, sigma: jax.Array, values: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked sum of elementwise Normal log-densities per utterance.

    Matches reference ``losses.py:13-33``: ``sigma`` is the standard deviation
    (the decoder already exponentiates log-sigma, ``models.py:199``), squared
    inside.  The density is evaluated per (timestep, feature), multiplied by
    the 0/1 mask, and summed over both sequence and feature axes.

    Args:
        mu: ``(B, F)`` per-utterance feature means.
        sigma: ``(B, F)`` per-utterance feature stdevs (already exp'd).
        values: observed features, broadcastable to ``(B, L, F)`` (e.g. a
            shared ``(L, F)`` positional table).
        mask: 0/1 mask (1 = real data), broadcastable to ``(B, L, F)``; a
            ``(B, L)`` token mask is auto-expanded over the feature axis.

    Returns:
        ``(B,)`` masked log-likelihood sums.
    """
    if mask.ndim == 2:  # (B, L) token mask → broadcast over features
        mask = mask[:, :, None]
    sig_sq = jnp.square(sigma)[:, None, :]  # (B, 1, F)
    # log(1/sqrt(2*pi*sig^2)) = -0.5*(log(2*pi) + log(sig^2))
    term1 = -0.5 * (_LOG_2PI + jnp.log(sig_sq))
    diff = values - mu[:, None, :]
    term2 = jnp.square(diff) / (2.0 * sig_sq)
    log_prob = (term1 - term2) * mask
    return jnp.sum(log_prob, axis=(-1, -2))


def gaussian_suff_stats(values, mask):
    """Per-(utterance, feature) sufficient statistics of the masked Gaussian
    sum: ``s0 = sum_l mask``, ``s1 = sum_l mask*x``, ``s2 = sum_l mask*x^2``.

    The masked log-density sum is quadratic in ``mu``, so these (N, F) arrays
    are all the data the training step ever needs for a Gaussian head — the
    sequence axis is eliminated from the hot loop exactly (a ~seq_len-fold
    reduction in VPU work and gather traffic).  Shapes broadcast like
    :func:`gaussian_logpdf_masked` (mask may be (N, L) or a feature vector).
    """
    if hasattr(mask, "ndim") and mask.ndim == 2:
        mask = mask[:, :, None]
    m = mask * jnp.ones_like(values)
    mv = mask * values
    return (
        jnp.sum(m, axis=-2),
        jnp.sum(mv, axis=-2),
        jnp.sum(mv * values, axis=-2),
    )


def gaussian_logpdf_suffstats(
    mu: jax.Array, sigma: jax.Array, s0: jax.Array, s1: jax.Array, s2: jax.Array
) -> jax.Array:
    """Masked Gaussian log-likelihood from sufficient statistics.

    Mathematically identical to :func:`gaussian_logpdf_masked`::

        sum_{l,f} mask*(term1 - (x-mu)^2/(2 sig^2))
          = sum_f [ term1*s0 - (s2 - 2 mu s1 + mu^2 s0) / (2 sig^2) ]

    Args:
        mu, sigma: ``(B, F)`` (sigma already exp'd, as everywhere).
        s0, s1, s2: ``(B, F)`` statistics from :func:`gaussian_suff_stats`
            (broadcastable — e.g. shared positional-table stats of shape
            ``(F,)``).

    Returns:
        ``(B,)``.
    """
    sig_sq = jnp.square(sigma)
    term1 = -0.5 * (_LOG_2PI + jnp.log(sig_sq))
    quad = s2 - 2.0 * mu * s1 + jnp.square(mu) * s0
    lp = term1 * s0 - quad / (2.0 * sig_sq)
    return jnp.sum(lp, axis=-1)

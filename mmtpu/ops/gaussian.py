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

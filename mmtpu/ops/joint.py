"""Joint multimodal log-likelihood (the MMB training objective).

TPU-native equivalent of reference ``losses.py:216-274``
(``get_log_prob_matrix``): sums the masked Gaussian log-likelihood of every
decoder head plus the word log-likelihood, with optional convex weighting.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from mmtpu.ops.gaussian import gaussian_logpdf_masked


def joint_log_prob(
    head_params: Mapping[str, Mapping[str, jax.Array]],
    data: Mapping[str, jax.Array],
    masks: Mapping[str, jax.Array],
    word_log_prob: jax.Array,
    word_loss_weight: float | jax.Array | None,
) -> jax.Array:
    """Per-utterance joint log-likelihood over all modality heads + words.

    Matches reference ``losses.py:249-274``: each head contributes a masked
    Gaussian log-density (``losses.py:251-256``); with ``word_loss_weight`` w
    set, heads share weight ``(1 - w) / n_heads`` and the word term gets w
    (``losses.py:267-270``); otherwise everything is summed unweighted.

    Args:
        head_params: ``{modality: {"mu": (B, F_m), "sigma": (B, F_m)}}`` —
            the decoder forward output (sigma already exp'd).
        data: ``{modality: (B, L, F_m)}`` observed features per head.
        masks: ``{modality: (B, L, F_m)}`` 0/1 masks per head.
        word_log_prob: ``(B,)`` word log-likelihood (see ``mmtpu.ops.wordprob``).
        word_loss_weight: scalar w, or None for unweighted summation.

    Returns:
        ``(B,)`` joint log-likelihoods.
    """
    head_lp = [
        gaussian_logpdf_masked(p["mu"], p["sigma"], data[m], masks[m])
        for m, p in head_params.items()
    ]
    gauss_total = sum(head_lp)
    if word_loss_weight is None:
        return gauss_total + word_log_prob
    w = jnp.asarray(word_loss_weight)
    other = (1.0 - w) / len(head_lp)
    return gauss_total * other + w * word_log_prob

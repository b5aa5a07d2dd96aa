"""Closed-form latent estimation — the "serving" path.

TPU-native equivalent of reference ``sif2.py:103-114`` (``calc_weights``) and
``sif2.py:164-208`` (``estimate_embedding_overall_gpu2``), which inverts the
trained linear-Gaussian decoder analytically: one pass of elementwise weights
plus per-head matmuls produces latent estimates with no gradient loop.  Timed
by the reference's ``--time_test`` harness (``simplesif.py:808-889``) — the
repo's only performance measurement.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax
import jax.numpy as jnp


def gaussian_inverse_weights(
    data: jax.Array, b_mu: jax.Array, b_log_sigma: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-element inverse weights for one decoder head.

    Matches reference ``sif2.py:103-114`` (which accepts a mask argument but —
    faithfully — does not apply it):

        q_mu    = (x - b_mu) / exp(2 b_logsigma)
        q_sigma = (x - b_mu)^2 / exp(2 b_logsigma) - 1

    Args:
        data: ``(B, L, F)`` observed features for the head.
        b_mu: ``(F,)`` mu-head bias.
        b_log_sigma: ``(F,)`` log-sigma-head bias.

    Returns:
        ``(q_mu, q_sigma)`` each ``(B, L, F)``.
    """
    inv_var = jnp.exp(-2.0 * b_log_sigma)[None, None, :]
    diff = data - b_mu[None, None, :]
    q_mu = diff * inv_var
    q_sigma = jnp.square(diff) * inv_var - 1.0
    return q_mu, q_sigma


def seq_summed_inverse_weights(
    s0: jax.Array, s1: jax.Array, s2: jax.Array,
    b_mu: jax.Array, b_log_sigma: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Sequence-summed inverse weights from Gaussian sufficient statistics.

    The closed-form estimator (``sif2.py:164-208``) only ever consumes the
    per-element weights :func:`gaussian_inverse_weights` summed over the
    sequence axis — and those sums are linear/quadratic in the observations,
    so the suff-stats triplet (``s0 = Σ_l m``, ``s1 = Σ_l m·x``,
    ``s2 = Σ_l m·x²`` — :func:`mmtpu.ops.gaussian.gaussian_suff_stats`)
    determines them exactly::

        Σ_l q_mu    = (s1 − s0·b_mu) / exp(2 b_logσ)
        Σ_l q_sigma = (s2 − 2 b_mu s1 + s0 b_mu²) / exp(2 b_logσ) − s0

    With an all-ones mask this is bit-for-the-same-math as summing
    :func:`gaussian_inverse_weights` over ``l`` (the reference faithfully
    ignores the mask; masked statistics additionally exclude padding, which
    for the warm-start use is the better estimate — documented deviation).

    Args:
        s0, s1, s2: ``(B, F)`` (or broadcastable, e.g. shared ``(F,)``
            positional-table statistics).
        b_mu, b_log_sigma: ``(F,)`` head bias slices.

    Returns:
        ``(Σ_l q_mu, Σ_l q_sigma)``, shaped like the broadcast of the inputs.
    """
    inv_var = jnp.exp(-2.0 * b_log_sigma)
    sum_q_mu = (s1 - s0 * b_mu) * inv_var
    sum_q_sigma = (s2 - 2.0 * b_mu * s1 + s0 * jnp.square(b_mu)) * inv_var - s0
    return sum_q_mu, sum_q_sigma


def closed_form_latents(
    data: Mapping[str, jax.Array],
    heads: Mapping[str, Mapping[str, jax.Array]],
    sentence_weights: jax.Array,
    sent_embeddings: jax.Array,
) -> jax.Array:
    """One-matmul-pass latent estimate from trained decoder weights.

    Matches reference ``sif2.py:164-208``: combine each head's inverse weights
    with the SIF word weights, normalize by the total weight, matmul against
    the decoder weight matrices, and L2-normalize rows.

    Args:
        data: ``{head: (B, L, F_h)}`` observed features per head (the six MMB2
            heads at ``sif2.py:167-174``; any head set works).
        heads: ``{head: {"w_mu": (D, F_h), "b_mu": (F_h,),
            "w_log_sigma": (D, F_h), "b_log_sigma": (F_h,)}}`` — decoder
            parameters in (in, out) layout (``mmtpu.models.decoder``).
        sentence_weights: ``(B, L)`` per-token SIF weights.
        sent_embeddings: ``(B, L, D)`` per-token word vectors.

    Returns:
        ``(B, D)`` L2-normalized latent estimates.
    """
    q_mu = {}
    q_sigma = {}
    total = jnp.sum(sentence_weights, axis=-1)  # (B,)
    for k, d in data.items():
        qm, qs = gaussian_inverse_weights(d, heads[k]["b_mu"], heads[k]["b_log_sigma"])
        q_mu[k], q_sigma[k] = qm, qs
        total = total + jnp.sum(qm, axis=(-1, -2)) + jnp.sum(qs, axis=(-1, -2))

    inv_total = 1.0 / total[:, None, None]  # (B, 1, 1)

    cs = jnp.einsum(
        "bl,bld->bd",
        sentence_weights * inv_total[:, :, 0],
        sent_embeddings,
        preferred_element_type=jnp.float32,
    )
    for k in data:
        # reference multiplies q (B, L, F) by Linear.weight (F, D) and sums
        # over L (sif2.py:203-205); our weights are stored (D, F) → transpose.
        w_mu_t = heads[k]["w_mu"].T  # (F_h, D)
        w_ls_t = heads[k]["w_log_sigma"].T
        cs = cs + jnp.einsum(
            "blf,fd->bd", q_mu[k] * inv_total, w_mu_t,
            preferred_element_type=jnp.float32,
        )
        cs = cs + jnp.einsum(
            "blf,fd->bd", q_sigma[k] * inv_total, w_ls_t,
            preferred_element_type=jnp.float32,
        )

    norm = jnp.linalg.norm(cs, axis=-1, keepdims=True)
    return cs / norm

"""Arora-style word-likelihood ops (angular and dot-product mixtures).

TPU-native equivalents of reference ``losses.py:36-151``.  The model is
``p(w | c) = alpha(c) * p(w) + (1 - alpha(c)) * score(w, c) / Z(c)`` where the
partition ``Z`` sums over the whole vocabulary — the dominant FLOPs of the
training step (an O(B*V*D) matmul per step).  ``angular_partition`` is kept
separable so the fused Pallas kernel (``mmtpu.kernels.angular``) can swap in.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_PI = math.pi
# torch.nn.CosineSimilarity default denominator clamp (reference losses.py:74).
_COS_EPS = 1e-8
# Margin keeping arccos' derivative finite at |cos| == 1.  The reference runs
# unclipped (torch acos), which yields inf gradients in the measure-zero case
# of exact collinearity; the clip changes values by < 1e-7 radians.
_ACOS_CLIP = 1e-7


def _safe_acos(cos: jax.Array) -> jax.Array:
    return jnp.arccos(jnp.clip(cos, -1.0 + _ACOS_CLIP, 1.0 - _ACOS_CLIP))


def angular_partition(latents: jax.Array, vocab_embeddings: jax.Array) -> jax.Array:
    """Angular partition ``Z_s = sum_v (1 - acos(cos(c, v)) / pi)``.

    Matches reference ``losses.py:76-78``.  Cosine similarity uses torch's
    denominator clamp ``max(|c||v|, 1e-8)``.

    Args:
        latents: ``(B, D)`` latent embeddings.
        vocab_embeddings: ``(V, D)`` word-vector table.

    Returns:
        ``(B, 1)`` partition values.
    """
    lat_norm = jnp.linalg.norm(latents, axis=-1, keepdims=True)  # (B, 1)
    voc_norm = jnp.linalg.norm(vocab_embeddings, axis=-1)  # (V,)
    dots = jnp.einsum(
        "bd,vd->bv", latents, vocab_embeddings, preferred_element_type=jnp.float32
    )
    cos = dots / jnp.maximum(lat_norm * voc_norm[None, :], _COS_EPS)
    z = jnp.sum(1.0 - _safe_acos(cos) / _PI, axis=-1, keepdims=True)
    return z


def _sentence_angular_score(latents: jax.Array, sent_embeddings: jax.Array) -> jax.Array:
    """``1 - acos(cos(sent_word, latent)) / pi`` per token (losses.py:84)."""
    lat_norm = jnp.linalg.norm(latents, axis=-1)[:, None]  # (B, 1)
    sent_norm = jnp.linalg.norm(sent_embeddings, axis=-1)  # (B, L)
    dots = jnp.einsum(
        "bld,bd->bl", sent_embeddings, latents, preferred_element_type=jnp.float32
    )
    cos = dots / jnp.maximum(sent_norm * lat_norm, _COS_EPS)
    return 1.0 - _safe_acos(cos) / _PI


def word_logprob_angular(
    latents: jax.Array,
    vocab_embeddings: jax.Array,
    word_weights: jax.Array,
    sent_embeddings: jax.Array,
    mask: jax.Array,
    a: float = 1e-3,
    partition_fn=None,
) -> jax.Array:
    """Angular-distance word log-likelihood per utterance.

    Matches reference ``losses.py:68-95`` (``get_word_log_prob_angular2``, the
    function actually selected by the shipped configs at ``simplesif.py:507``):

        Z_s    = sum_v (1 - acos(cos(c, v)) / pi)
        alpha  = 1 / (Z_s * a + 1)
        p(w|c) = alpha * weight(w) + (1 - alpha) * score(w, c) / Z_s
        out    = sum_l mask_l * log p(w_l | c)

    Args:
        latents: ``(B, D)``.
        vocab_embeddings: ``(V, D)``.
        word_weights: ``(B, L)`` per-token unigram weights (pre-gathered).
        sent_embeddings: ``(B, L, D)`` per-token word vectors (pre-gathered).
        mask: ``(B, L)`` 0/1 token mask (reference passes the broadcast
            ``(B, L, D)`` text mask and slices channel 0, ``losses.py:92``).
        a: mixture smoothing constant (``simplesif.py:513``).
        partition_fn: optional override computing ``Z_s`` — hook for the
            fused Pallas kernel.

    Returns:
        ``(B,)`` word log-likelihoods.
    """
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    z = (partition_fn or angular_partition)(latents, vocab_embeddings)  # (B, 1)
    alpha = 1.0 / (z * a + 1.0)
    unigram = alpha * word_weights
    score = _sentence_angular_score(latents, sent_embeddings)
    context = (1.0 - alpha) * score / z
    log_probs = jnp.log(unigram + context) * mask
    return jnp.sum(log_probs, axis=-1)


def word_logprob_dot_prod(
    latents: jax.Array,
    vocab_embeddings: jax.Array,
    word_weights: jax.Array,
    sent_embeddings: jax.Array,
    mask: jax.Array,
    a: float = 1e-3,
) -> jax.Array:
    """Dot-product (softmax-form) word log-likelihood per utterance.

    Matches reference ``losses.py:126-151`` (``get_word_log_prob_dot_prod2``
    — the only dot-prod variant whose arity fits the call site
    ``losses.py:236``; the reference CLI's ``dot_prod`` selection at
    ``simplesif.py:508-509`` actually binds the 5-arg v1 and would crash,
    so this implements the evidently intended masked semantics):

        Z_s    = sum_v exp(c . v)
        alpha  = 1 / (Z_s * a + 1)
        p(w|c) = alpha * weight(w) + (1 - alpha) * exp(c . w) / Z_s

    Args / returns: as :func:`word_logprob_angular`.
    """
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    logits = jnp.einsum(
        "bd,vd->bv", latents, vocab_embeddings, preferred_element_type=jnp.float32
    )
    z = jnp.sum(jnp.exp(logits), axis=-1, keepdims=True)  # (B, 1)
    alpha = 1.0 / (z * a + 1.0)
    unigram = alpha * word_weights
    dot = jnp.einsum(
        "bld,bd->bl", sent_embeddings, latents, preferred_element_type=jnp.float32
    )
    context = (1.0 - alpha) * jnp.exp(dot) / z
    log_probs = jnp.log(unigram + context) * mask
    return jnp.sum(log_probs, axis=-1)

"""Embedding analysis — nearest-neighbor words diagnostic.

The reference imports ``get_closest_words`` from an ``analyze_embeddings``
module that is absent from its repo (``simplesif.py:30``; SURVEY.md §2
row 20), so ``simplesif.py`` cannot run unmodified.  This is the working
equivalent: cosine-kNN of each utterance embedding against the vocabulary.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


def closest_word_ids(
    embeddings, word_embeddings, k: int = 5
) -> np.ndarray:
    """Top-k vocab ids by cosine similarity for each embedding row.

    Args:
        embeddings: ``(N, D)`` utterance embeddings.
        word_embeddings: ``(V, D)`` vocabulary table.
        k: neighbors per row.

    Returns:
        ``(N, k)`` int array of word ids, most-similar first.
    """
    e = jnp.asarray(embeddings)
    w = jnp.asarray(word_embeddings)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-8)
    sims = e @ w.T  # (N, V)
    _, idx = jax.lax.top_k(sims, k)
    return np.asarray(idx)


def get_closest_words(
    embeddings,
    word_embeddings,
    word2ix: Dict[str, int],
    k: int = 5,
) -> List[List[str]]:
    """Per-utterance lists of the k closest vocabulary words (the diagnostic
    the reference calls at ``simplesif.py:437-438``)."""
    ix2word = {}
    for word, ix in word2ix.items():
        ix2word.setdefault(int(ix), word)
    ids = closest_word_ids(embeddings, word_embeddings, k)
    return [
        [ix2word.get(int(i), f"<{int(i)}>") for i in row] for row in ids
    ]

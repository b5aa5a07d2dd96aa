"""SIF sentence-embedding ops (Arora et al.'s smooth-inverse-frequency init).

TPU-native equivalents of the reference's numpy/sklearn cold-start path:

- per-token weight lookup       (reference: ``sif_functions.py:8-15`` —
  a python double loop; here a masked gather),
- weighted word averaging       (reference: ``sif_functions.py:28-56`` —
  a python loop over sentences; here one einsum that lands on the MXU),
- first-principal-component removal (reference: ``sif_functions.py:58-81`` —
  sklearn ``TruncatedSVD(n_components=1, n_iter=7, random_state=0)`` on the
  *uncentered* data; here an exact on-device eigendecomposition of the
  d×d Gram matrix, which agrees with the randomized SVD up to sign).

All functions are jit/vmap/grad-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seq_weights(token_ids: jax.Array, vocab_weights: jax.Array) -> jax.Array:
    """Per-token SIF weights for a batch of token-id sequences.

    Semantics of reference ``sif_functions.py:8-15`` (``seq2weight`` with an
    all-ones mask, as called from ``sif.py:78-82``): weight is
    ``vocab_weights[id]`` where ``id >= 0``, else 0.  Note the reference does
    NOT zero the weight of padding id 0 here — the id-0 weight flows through
    and padding is handled later by loss masks — so neither do we.

    Args:
        token_ids: ``(N, L)`` integer word ids (may contain negatives for
            "no token").
        vocab_weights: ``(V,)`` per-word weights ``a / (a + p(w))``.

    Returns:
        ``(N, L)`` float32 weights.
    """
    valid = token_ids >= 0
    safe_ids = jnp.where(valid, token_ids, 0)
    return (vocab_weights[safe_ids] * valid).astype(jnp.float32)


def sif_weighted_average(
    word_embeddings: jax.Array, token_ids: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted average of word vectors per sentence.

    Matches reference ``sif_functions.py:28-56``:
    ``emb[i] = w[i] . We[x[i]] / count_nonzero(w[i])`` — but batched as a
    gather + einsum instead of a python loop over sentences.  The divisor is
    clamped to >= 1 so an all-padding row yields zeros instead of NaN (the
    reference would divide by zero; this only differs on degenerate rows).

    Args:
        word_embeddings: ``(V, D)`` word-vector table.
        token_ids: ``(N, L)`` integer ids (negatives treated as id 0, whose
            contribution is already zeroed by a zero weight).
        weights: ``(N, L)`` per-token weights (zeros mark non-tokens).

    Returns:
        ``(N, D)`` float32 sentence embeddings.
    """
    safe_ids = jnp.where(token_ids >= 0, token_ids, 0)
    gathered = word_embeddings[safe_ids]  # (N, L, D)
    summed = jnp.einsum(
        "nl,nld->nd", weights, gathered, preferred_element_type=jnp.float32
    )
    counts = jnp.maximum(jnp.sum(weights != 0, axis=-1), 1)
    return summed / counts[:, None].astype(summed.dtype)


def first_pc(x: jax.Array) -> jax.Array:
    """First principal direction of the *uncentered* data matrix ``x``.

    Equals the top right-singular vector of ``x``, i.e. the top eigenvector of
    the ``(D, D)`` Gram matrix ``x.T @ x``.  The reference
    (``sif_functions.py:58-67``) uses sklearn's randomized
    ``TruncatedSVD(n_components=1, n_iter=7, random_state=0)`` — deliberately
    WITHOUT centering; we compute the exact eigenvector on device instead,
    which matches to numerical tolerance up to sign (sign is irrelevant to
    `remove_pc`, which is quadratic in the component).

    Args:
        x: ``(N, D)`` data matrix.

    Returns:
        ``(D,)`` unit-norm principal direction.
    """
    gram = jnp.einsum("nd,ne->de", x, x, preferred_element_type=jnp.float32)
    # eigh returns eigenvalues ascending; top eigenvector is the last column.
    _, vecs = jnp.linalg.eigh(gram)
    pc = vecs[:, -1]
    return pc / jnp.linalg.norm(pc)


def remove_pc(x: jax.Array, pc: jax.Array | None = None) -> jax.Array:
    """Remove the projection of each row of ``x`` onto the first PC.

    Matches reference ``sif_functions.py:69-81`` for ``npc=1``:
    ``XX = X - (X @ pc) pc``.

    Args:
        x: ``(N, D)``.
        pc: optional precomputed ``(D,)`` principal direction.

    Returns:
        ``(N, D)`` with the rank-one component removed.
    """
    if pc is None:
        pc = first_pc(x)
    coeff = x @ pc  # (N,)
    return x - coeff[:, None] * pc[None, :]


def sif_embedding(
    word_embeddings: jax.Array,
    token_ids: jax.Array,
    weights: jax.Array,
    rmpc: int = 1,
) -> jax.Array:
    """Full SIF pipeline: weighted average then first-PC removal.

    Matches reference ``sif_functions.py:84-96`` / driver ``sif.py:84-94``
    (which fixes ``rmpc=1``).

    Args:
        word_embeddings: ``(V, D)``.
        token_ids: ``(N, L)`` int ids.
        weights: ``(N, L)`` per-token weights (see :func:`seq_weights`).
        rmpc: number of principal components to remove (0 or 1 supported).

    Returns:
        ``(N, D)`` sentence embeddings.
    """
    emb = sif_weighted_average(word_embeddings, token_ids, weights)
    if rmpc > 0:
        if rmpc != 1:
            raise NotImplementedError("only rmpc in {0, 1} is supported")
        emb = remove_pc(emb)
    return emb

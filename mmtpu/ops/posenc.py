"""Sinusoidal positional-embedding channels appended to audio/visual features.

TPU-native equivalent of reference ``utils.py:130-153``
(``add_positional_embeddings``), which appends ``pos_embed_dim`` channels of
transformer-style sin/cos positional codes to each frame.

The reference implementation contains an indexing bug: its sin/cos loop writes
``idxes[2*i, :]`` on an ``(N, L, P)`` array, i.e. it indexes the *batch* axis
instead of the channel axis (``utils.py:146-148``), so only samples
``0 .. pos_embed_dim-1`` receive sin/cos codes while every other sample gets
raw integer positions appended.  ``bug_parity=True`` replicates that exact
behavior; the default implements the evidently intended math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def positional_encoding(
    seq_len: int, pos_embed_dim: int, dtype=jnp.float32
) -> jax.Array:
    """Correct ``(seq_len, pos_embed_dim)`` sin/cos table.

    ``PE(pos, 2i) = sin(pos / 10000^(2i/P))``,
    ``PE(pos, 2i+1) = cos(pos / 10000^(2i/P))`` (docstring of
    ``utils.py:130-134``).
    """
    pos = jnp.arange(seq_len, dtype=dtype)[:, None]  # (L, 1)
    chan = jnp.arange(pos_embed_dim)  # (P,)
    # exponent uses the even channel index 2i for both sin (2i) and cos (2i+1)
    even = (chan // 2) * 2
    inv_freq = jnp.power(10000.0, -(even.astype(dtype) / pos_embed_dim))
    angles = pos * inv_freq[None, :]  # (L, P)
    return jnp.where((chan % 2) == 0, jnp.sin(angles), jnp.cos(angles))


def add_positional_embeddings(
    data: jax.Array, pos_embed_dim: int, bug_parity: bool = False
) -> jax.Array:
    """Append positional channels to ``(N, L, F)`` features → ``(N, L, F+P)``.

    Args:
        data: ``(N, L, F)`` features.
        pos_embed_dim: number of channels to append.
        bug_parity: replicate the reference's batch-axis indexing bug
            (``utils.py:146-148``) exactly.
    """
    n, seq_len = data.shape[0], data.shape[1]
    if not bug_parity:
        pe = positional_encoding(seq_len, pos_embed_dim, data.dtype)
        pe = jnp.broadcast_to(pe[None], (n, seq_len, pos_embed_dim))
        return jnp.concatenate([data, pe], axis=-1)

    # Bug-parity path: start from raw positions tiled to (N, L, P); for
    # i in range(P // 2) overwrite SAMPLE rows 2i / 2i+1 with sin / cos of the
    # whole (L, P) slab at frequency 10000^(2i/P) — exactly what the
    # reference's loop does on its (N, L, P) array.
    pos = jnp.arange(seq_len, dtype=data.dtype)
    idxes = jnp.broadcast_to(pos[None, :, None], (n, seq_len, pos_embed_dim))
    out = idxes
    for i in range(pos_embed_dim // 2):
        if 2 * i >= n:
            break
        scale = 10000.0 ** (2 * i / pos_embed_dim)
        out = out.at[2 * i].set(jnp.sin(idxes[2 * i] / scale))
        if 2 * i + 1 < n:
            out = out.at[2 * i + 1].set(jnp.cos(idxes[2 * i + 1] / scale))
    return jnp.concatenate([data, out], axis=-1)

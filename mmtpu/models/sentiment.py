"""Downstream sentiment/trait MLP as a functional parameter pytree.

TPU-native equivalent of reference ``sentiment_model.py:29-41``
(``SentimentModel``): ``Linear(D→H) → ReLU → Linear(H→n_out)`` with a final
squeeze when ``n_out == 1``.

For the vmapped hyperparameter sweep, ``hidden_pad`` lets configs with
different ``sentiment_hidden_size`` share one shape: extra hidden units are
zero-initialized, and zero-initialized ReLU units are *provably dead* under
both SGD and Adam (their input weights get zero gradient because the unit's
output is 0, and their output weights get zero gradient because the unit's
activation is 0), so a padded model is numerically identical to the unpadded
one for every step of training.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from mmtpu.models.init import torch_linear_init


def init_sentiment(
    key: jax.Array,
    embed_dim: int,
    hidden_dim: int,
    n_out: int,
    hidden_pad: int | None = None,
    dtype=jnp.float32,
) -> dict:
    """Initialize MLP params; optionally zero-pad hidden units to ``hidden_pad``."""
    k1, k2 = jax.random.split(key)
    l1 = torch_linear_init(k1, embed_dim, hidden_dim, dtype)
    l2 = torch_linear_init(k2, hidden_dim, n_out, dtype)
    if hidden_pad is not None and hidden_pad > hidden_dim:
        pad = hidden_pad - hidden_dim
        l1 = {
            "w": jnp.pad(l1["w"], ((0, 0), (0, pad))),
            "b": jnp.pad(l1["b"], ((0, pad),)),
        }
        l2 = {"w": jnp.pad(l2["w"], ((0, pad), (0, 0))), "b": l2["b"]}
    return {"w1": l1["w"], "b1": l1["b"], "w2": l2["w"], "b2": l2["b"]}


def apply_sentiment(params: Mapping[str, jax.Array], x: jax.Array) -> jax.Array:
    """Forward pass; squeezes the trailing dim iff n_out == 1
    (reference ``sentiment_model.py:36-41``)."""
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    out = h @ params["w2"] + params["b2"]
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out

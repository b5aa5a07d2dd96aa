"""Collective-based sharded ops.

The word-likelihood partition ``Z_s = sum_v f(cos(c, v))`` is a sum over the
vocabulary (reference ``losses.py:76-78``) and shards cleanly along the vocab
axis: each device scores its vocab shard and a single ``psum`` over ICI
combines them (SURVEY.md §5).  Used when a vocabulary is too large for one
chip's HBM or to parallelize the dominant matmul of a single config.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_PI = math.pi
_COS_EPS = 1e-8
_ACOS_CLIP = 1e-7


def _local_partition(latents: jax.Array, vocab_shard: jax.Array, axis: str):
    lat_norm = jnp.linalg.norm(latents, axis=-1, keepdims=True)
    voc_norm = jnp.linalg.norm(vocab_shard, axis=-1)
    dots = jnp.einsum(
        "bd,vd->bv", latents, vocab_shard, preferred_element_type=jnp.float32
    )
    cos = dots / jnp.maximum(lat_norm * voc_norm[None, :], _COS_EPS)
    acos = jnp.arccos(jnp.clip(cos, -1.0 + _ACOS_CLIP, 1.0 - _ACOS_CLIP))
    local = jnp.sum(1.0 - acos / _PI, axis=-1, keepdims=True)
    return jax.lax.psum(local, axis_name=axis)


def sharded_angular_partition(
    latents: jax.Array, vocab_embeddings: jax.Array, mesh: Mesh, axis: str = "vocab"
) -> jax.Array:
    """``Z_s`` with the vocabulary sharded over ``axis`` and psum over ICI.

    Drop-in replacement for :func:`mmtpu.ops.wordprob.angular_partition`
    under a mesh: latents replicated, vocab row-sharded.
    """
    fn = jax.shard_map(
        partial(_local_partition, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(latents, vocab_embeddings)

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


def sharded_gaussian_logpdf(
    mu: jax.Array,
    sigma: jax.Array,
    values: jax.Array,
    mask: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
) -> jax.Array:
    """Masked Gaussian log-likelihood with the SEQUENCE axis sharded.

    The reference has no long-context machinery; its only long sequences are
    POM token rows (up to 1357 steps, SURVEY.md §5).  Because the MMB
    likelihood is a masked segment-sum over timesteps, it shards trivially
    along the sequence axis: each device sums its shard and one ``psum``
    combines (mu/sigma are per-utterance and replicated).

    Args:
        mu, sigma: ``(B, F)``.
        values, mask: ``(B, L, F)`` with L divisible by the mesh axis size.
        mesh: mesh with ``axis``.

    Returns:
        ``(B,)``.
    """
    from mmtpu.ops.gaussian import gaussian_logpdf_masked

    def local(mu, sigma, v, m):
        return jax.lax.psum(
            gaussian_logpdf_masked(mu, sigma, v, m), axis_name=axis
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(mu, sigma, values, mask)

"""Mesh-integrated training — one oversized config spanning chips.

The reference is strictly single-device (SURVEY.md §2 row 23); the sweep's
"config" axis (mmtpu.sweep) covers the common case of many small configs.
This module covers the other direction: ONE config whose step is too big (or
too slow) for a single chip, parallelized over a 2-D mesh:

- **batch axis** ("data"): each minibatch's rows are split across devices via
  a GSPMD sharding constraint inside the loss (``LatentFitSpec
  .batch_shard_axis``); XLA inserts the gradient ``psum`` over ICI.  Exactly
  the reference math — loss means, batch-norm statistics, and decoder
  gradients all reduce over the logically-global batch.
- **vocab axis** ("vocab"): the word-likelihood partition ``Z_s`` (the
  dominant O(B·V·D) matmul, reference ``losses.py:76-78``) runs with the
  vocabulary table row-sharded; XLA turns the sum over V into a
  ``reduce_scatter``/``all_reduce`` over ICI.

Everything else (embedding table, decoder, optimizer states) stays
replicated: MMB decoders are KB-scale, so data/compute parallelism — not
parameter sharding — is the right decomposition.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtpu.train.e2e import E2EFitSpec, fit_e2e
from mmtpu.train.latents import LatentFitSpec, fit_latents

_fit = jax.jit(fit_latents, static_argnums=(6,))
_fit_e2e = jax.jit(fit_e2e, static_argnums=(8,))


def _mesh_context(mesh: Mesh):
    """``jax.sharding.use_mesh`` when available (newer jax), else the Mesh
    context manager — both make bare PartitionSpec constraints resolvable
    inside jit."""
    use_mesh = getattr(jax.sharding, "use_mesh", None)
    if use_mesh is not None:
        return use_mesh(mesh)
    return mesh


def place_fit_inputs(
    mesh: Mesh,
    vocab_emb,
    spec,
    batch_axis: Optional[str],
    vocab_axis: Optional[str],
    *replicated_trees,
):
    """Shared input placement for the mesh fits: the vocabulary table is
    row-sharded over ``vocab_axis`` (when divisible), everything else is
    replicated, and ``spec.batch_shard_axis`` is set so the per-step GSPMD
    constraint splits minibatch rows over ``batch_axis``.

    Returns ``(vocab_placed, spec, placed_trees...)`` — exposed (rather than
    inlined in :func:`fit_latents_mesh`) so callers like
    ``__graft_entry__.dryrun_multichip`` can assert the actual device
    placement instead of trusting GSPMD not to replicate.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    repl = NamedSharding(mesh, P())

    vocab_emb = jnp.asarray(vocab_emb)
    n_v = axis_sizes.get(vocab_axis, 1) if vocab_axis else 1
    vocab_sh = (
        NamedSharding(mesh, P(vocab_axis))
        if vocab_axis and n_v > 1 and vocab_emb.shape[0] % n_v == 0
        else repl
    )
    vocab_emb = jax.device_put(vocab_emb, vocab_sh)

    put = lambda t: jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), repl), t
    )
    placed = tuple(put(t) for t in replicated_trees)

    n_b = axis_sizes.get(batch_axis, 1) if batch_axis else 1
    spec = dataclasses.replace(
        spec,
        batch_shard_axis=(
            batch_axis if batch_axis and n_b > 1
            and spec.batch_size % n_b == 0 else None
        ),
    )
    return (vocab_emb, spec) + placed


def fit_latents_mesh(
    mesh: Mesh,
    rng: jax.Array,
    init_embed,
    decoder_params,
    data: Mapping,
    vocab_emb,
    hp: Mapping,
    spec: LatentFitSpec,
    batch_axis: Optional[str] = "data",
    vocab_axis: Optional[str] = "vocab",
):
    """Run :func:`mmtpu.train.latents.fit_latents` sharded over ``mesh``.

    Equivalent to the single-device fit up to float reduction order
    (equivalence-tested on the 8-device CPU mesh in tests/test_parallel.py).

    Axes degrade gracefully: a batch size not divisible by the batch-axis
    extent disables row sharding for that call; a vocab size not divisible by
    the vocab-axis extent keeps the vocab replicated.
    """
    vocab_emb, spec, data, init_embed, decoder_params, hp = place_fit_inputs(
        mesh, vocab_emb, spec, batch_axis, vocab_axis,
        dict(data), init_embed, decoder_params, dict(hp),
    )
    with _mesh_context(mesh):
        return _fit(rng, init_embed, decoder_params, data, vocab_emb, hp, spec)


def fit_e2e_mesh(
    mesh: Mesh,
    rng: jax.Array,
    init_embed,
    decoder_params,
    senti_params,
    data: Mapping,
    labels,
    vocab_emb,
    hp: Mapping,
    spec: E2EFitSpec,
    senti_mask=None,
    batch_axis: Optional[str] = "data",
    vocab_axis: Optional[str] = "vocab",
):
    """Run :func:`mmtpu.train.e2e.fit_e2e` (the shipped grid's default mode —
    joint likelihood + L1 sentiment, simplesif.py:625-912) sharded over
    ``mesh``, with the same axis semantics and graceful degradation as
    :func:`fit_latents_mesh`.  Equivalence-tested on the 8-device CPU mesh
    (tests/test_parallel.py)."""
    (vocab_emb, spec, data, init_embed, decoder_params, senti_params,
     labels, hp) = place_fit_inputs(
        mesh, vocab_emb, spec, batch_axis, vocab_axis,
        dict(data), init_embed, decoder_params, senti_params, labels,
        dict(hp),
    )
    if senti_mask is not None:
        senti_mask = jax.device_put(
            jnp.asarray(senti_mask), NamedSharding(mesh, P()))
    with _mesh_context(mesh):
        return _fit_e2e(rng, init_embed, decoder_params, senti_params, data,
                        labels, vocab_emb, hp, spec, senti_mask)


def make_fit_mesh(
    n_batch: Optional[int] = None,
    n_vocab: Optional[int] = None,
    devices=None,
) -> Mesh:
    """A ("data", "vocab") mesh; default splits all devices onto the batch
    axis (vocab replicated)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_batch is None and n_vocab is None:
        n_batch, n_vocab = n, 1
    elif n_batch is None:
        n_batch = n // n_vocab
    elif n_vocab is None:
        n_vocab = n // n_batch
    assert n_batch * n_vocab <= n, (n_batch, n_vocab, n)
    arr = np.array(devices[: n_batch * n_vocab]).reshape(n_batch, n_vocab)
    return Mesh(arr, ("data", "vocab"))

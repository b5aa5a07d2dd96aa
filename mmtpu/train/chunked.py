"""Epoch-chunked latent fits with mid-run checkpoint/resume.

The reference restarts a killed run from scratch (SURVEY.md §5 — artifact
saving only, no resume).  A monolithic mmtpu fit is ONE jitted scan — great
for throughput, but uninterruptible.  This module runs the same fit as a
host-side loop over jitted epoch SEGMENTS (``fit_latents_segment``), saving
the full scan carry (embeddings, decoder, optimizer moments, rng key) after
every segment:

- uninterrupted, the result is EXACTLY the monolithic ``fit_latents`` (same
  epoch indices, same rng threading — tested in tests/test_aux.py);
- killed at any point, the next call with the same ``checkpointer`` resumes
  at the last completed segment boundary instead of epoch 0.

One segment program is compiled and reused for every segment (the epoch
offset is a traced scalar).
"""

from __future__ import annotations

import hashlib
import json
from typing import Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmtpu.io.checkpoint import Checkpointer
from mmtpu.train.latents import (
    LatentFitSpec,
    fit_latents_segment,
    init_fit_carry,
)

_segment = jax.jit(fit_latents_segment, static_argnums=(4, 6))


def _fit_fingerprint(init_embed, data, vocab_emb, hp, spec) -> str:
    """Identify everything that determines the trajectory (hyperparameters,
    spec, input shapes/dtypes), so a checkpoint from a *different* fit is
    refused instead of silently spliced.  Same-shape content swaps are
    caught by a cheap float64 sum over every input array."""
    import dataclasses
    spec_desc = {
        f.name: (getattr(v, "__name__", str(v)) if callable(v) else v)
        for f in dataclasses.fields(spec)
        for v in [getattr(spec, f.name)]
    }  # callables (partition_fn) by name — repr would embed a memory address
    desc = {
        "spec": spec_desc,
        "hp": {k: float(np.asarray(v)) for k, v in sorted(dict(hp).items())},
        "data": {
            k: (str(np.asarray(v).dtype), list(np.shape(v)),
                float(np.sum(np.asarray(v, np.float64))))
            for k, v in sorted(dict(data).items())
        },
        "vocab": [list(np.shape(vocab_emb)),
                  float(np.sum(np.asarray(vocab_emb, np.float64)))],
        "init": [list(np.shape(init_embed)),
                 float(np.sum(np.asarray(init_embed, np.float64)))],
    }
    return hashlib.sha256(
        json.dumps(desc, sort_keys=True).encode()
    ).hexdigest()


def fit_latents_checkpointed(
    rng: jax.Array,
    init_embed,
    decoder_params,
    data: Mapping,
    vocab_emb,
    hp: Mapping,
    spec: LatentFitSpec,
    checkpointer: Optional[Checkpointer] = None,
    segment_epochs: int = 25,
    verbose: bool = False,
):
    """Drop-in replacement for ``fit_latents`` (no-validation mode) that can
    resume a killed run at segment granularity.

    Returns ``(embed, decoder_params, losses)`` — identical to the monolithic
    fit when run to completion.
    """
    if spec.valid_every:
        raise ValueError("validation-curve mode is monolithic-only")
    n_total = spec.n_epochs_max
    # preserve the caller's decoder layout, mirroring fit_latents: a caller
    # passing already-stacked params gets stacked params back
    from mmtpu.models.decoder import is_stacked

    was_stacked = is_stacked(decoder_params)
    carry = init_fit_carry(rng, init_embed, decoder_params, spec)
    losses = np.zeros(n_total, np.float32)
    start = 0

    fingerprint = None
    if checkpointer is not None:
        fingerprint = _fit_fingerprint(init_embed, data, vocab_emb, hp, spec)
        saved, step, extra = checkpointer.restore((carry, losses))
        if saved is not None:
            if extra.get("fingerprint") == fingerprint:
                carry, saved_losses = saved
                losses = np.asarray(saved_losses, np.float32).copy()
                start = int(step)
                if verbose:
                    print(f"[chunked] resuming at epoch {start}/{n_total}")
            elif verbose:
                print("[chunked] checkpoint belongs to a different fit "
                      "(fingerprint mismatch) — starting at epoch 0")

    for s0 in range(start, n_total, segment_epochs):
        # n_seg is a static int: every full segment reuses one compiled
        # program; a shorter tail segment compiles at most once more
        n_seg = min(segment_epochs, n_total - s0)
        carry, seg_losses = _segment(
            carry, data, vocab_emb, hp, spec, jnp.int32(s0), n_seg
        )
        losses[s0 : s0 + n_seg] = np.asarray(seg_losses)
        if checkpointer is not None:
            jax.block_until_ready(carry[0])
            checkpointer.save(
                s0 + n_seg, (carry, losses),
                extra={"n_epochs_max": n_total, "fingerprint": fingerprint},
            )
    embed, dec = carry[0], carry[1]
    # carry travels stacked (init_fit_carry); restore the per-head pytree
    from mmtpu.train.latents import finish_fit_decoder

    dec = finish_fit_decoder(dec, data, spec, was_stacked=was_stacked)
    return embed, dec, jnp.asarray(losses)

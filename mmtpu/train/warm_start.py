"""Closed-form warm start for inference fits — from sufficient statistics.

The reference initializes valid/test latent fits from the SIF embedding and
optimizes for the config's full epoch count (``simplesif.py:607-610``).  An
opt-in alternative (VERDICT r4 task 4): initialize from the CLOSED-FORM
latent estimate of the just-trained decoder (``sif2.py:164-208`` semantics —
the same inversion ``mmtpu/serve.py`` ships for production serving), which
starts the frozen-decoder optimization near its fixed point so the epoch
count can be capped (``SweepStatics.infer_epochs_cap``).

TPU-native twist: the sweep's hot data view carries only the Gaussian
sufficient statistics (``<stream>_s0/s1/s2`` — ``train_view``), not the raw
``(N, L, F)`` streams, and the closed form only ever consumes the inverse
weights SUMMED over the sequence axis — which the statistics determine
exactly (:func:`mmtpu.ops.closed_form.seq_summed_inverse_weights`).  So the
warm start runs inside the compiled sweep program with no extra HBM-resident
streams and no per-timestep work except the one (B, L, D) text gather the
word likelihood already pays every step.

Parity note (why this is opt-in, default OFF): the warm start changes the
optimization trajectory (a different, much closer init), so per-config
losses/metrics are NOT step-for-step reference-parity — the envelope is
documented by tests/test_warm_start.py and the clamp defaults leave it off.
It uses MASKED statistics (padding excluded), unlike the reference estimator
which faithfully ignores the mask; with zero padding and all-ones masks the
two agree exactly (tested).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from mmtpu.models.decoder import MMB1_HEADS, MMB2_HEADS
from mmtpu.ops.closed_form import seq_summed_inverse_weights
from mmtpu.train.latents import _head_parts


def closed_form_latents_from_stats(
    decoder_params,
    data: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    unimodal: bool = False,
    heads=None,
) -> jax.Array:
    """Closed-form latent estimate on the sweep's suff-stats data layout.

    Mirrors :func:`mmtpu.ops.closed_form.closed_form_latents`
    (``sif2.py:164-208``) head by head, but consumes the per-stream
    sufficient statistics (plus shared positional-table statistics) in the
    exact segment order the decoder's mu/sigma columns use
    (``mmtpu.train.latents._head_parts``), so concatenated-modality heads
    need no materialized ``torch.cat`` tensors.

    Args:
        decoder_params: trained per-head decoder pytree
            (``{"heads": {h: {w_mu (D,F), b_mu (F,), ...}}, "norm": ...}``).
        data: a prepared split dict carrying ``text_ids``/``text`` +
            ``text_weights`` and ``<stream>_s0/s1/s2`` statistics (the
            ``train_view`` layout).
        vocab_emb: ``(V, D)`` word-vector table.
        unimodal: MMB1 (audio/visual heads only) vs MMB2.
        heads: explicit head subset (overrides ``unimodal``) — the serving
            wrapper's head-selection contract (``mmtpu.serve``).

    Returns:
        ``(B, D)`` L2-normalized latent estimates, float32.
    """
    if heads is None:
        heads = MMB1_HEADS if unimodal else MMB2_HEADS
    heads = tuple(heads)
    w = data["text_weights"]  # (B, L), zero at padding (data.pipeline)
    total = jnp.sum(w, axis=-1)  # (B,)
    per_head = {}
    for h in heads:
        hp = decoder_params["heads"][h]
        sums = []
        ofs = 0
        for part in _head_parts(h, data):
            if part[0] != "stats":
                raise ValueError(
                    "closed_form_latents_from_stats needs the suff-stats "
                    "data layout (prepare_device_data(..., suff_stats=True))"
                )
            _, s0, s1, s2 = part
            f = s0.shape[-1]
            sq_mu, sq_sigma = seq_summed_inverse_weights(
                s0, s1, s2, hp["b_mu"][ofs:ofs + f],
                hp["b_log_sigma"][ofs:ofs + f],
            )
            sums.append((ofs, f, sq_mu, sq_sigma))
            # shared (F,) positional stats contribute per-row-identical mass
            total = total + jnp.sum(sq_mu, axis=-1) + jnp.sum(sq_sigma, axis=-1)
            ofs += f
        per_head[h] = sums

    # all-zero-stats rows (serving-ladder padding) divide to 0, not nan/inf
    inv_total = 1.0 / jnp.where(total == 0.0, 1.0, total)[:, None]  # (B, 1)

    sent = data["text"] if "text" in data else vocab_emb[data["text_ids"]]
    cs = jnp.einsum("bl,bld->bd", w, sent,
                    preferred_element_type=jnp.float32)
    for h in heads:
        hp = decoder_params["heads"][h]
        for ofs, f, sq_mu, sq_sigma in per_head[h]:
            # weights stored (D, F) → right-multiply by the (F, D) transpose,
            # the reference's Linear.weight orientation (sif2.py:203-205)
            cs = cs + jnp.einsum(
                "bf,fd->bd", jnp.broadcast_to(sq_mu, (w.shape[0], f)),
                hp["w_mu"][:, ofs:ofs + f].T,
                preferred_element_type=jnp.float32,
            )
            cs = cs + jnp.einsum(
                "bf,fd->bd", jnp.broadcast_to(sq_sigma, (w.shape[0], f)),
                hp["w_log_sigma"][:, ofs:ofs + f].T,
                preferred_element_type=jnp.float32,
            )
    cs = cs * inv_total
    norm = jnp.linalg.norm(cs, axis=-1, keepdims=True)
    return (cs / jnp.where(norm == 0.0, 1.0, norm)).astype(jnp.float32)

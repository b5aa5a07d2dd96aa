"""Legacy alternating driver: closed-form estimation ⇄ decoder updates.

Working TPU-native equivalent of the reference's legacy ``sif2.py`` pipeline
(``optimize_embeddings``, ``sif2.py:339-462``): each epoch, (1) re-estimate
every latent in closed form from the current bimodal decoder
(``estimate_embedding_overall``), then (2) run minibatch SGD on the decoder
parameters against the old-style joint log-likelihood
(``get_log_prob_matrix_old``, ``losses.py:153-214`` — word term + audio/visual
Gaussians with weights w and (1-w)/2 each).

The upstream driver is stale/broken as-is (undefined imports, wrong arities —
SURVEY.md §2 row 19); only its closed-form estimators are live.  This module
implements the evidently intended algorithm as one jitted scan program.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from mmtpu.models.legacy import apply_audio_visual_generator
from mmtpu.ops.closed_form import closed_form_latents
from mmtpu.ops.gaussian import gaussian_logpdf_masked
from mmtpu.ops.wordprob import word_logprob_angular, word_logprob_dot_prod


@dataclasses.dataclass(frozen=True)
class AlternatingFitSpec:
    n_epochs: int = 100  # sif2.py:405
    batch_size: int = 32  # sif2.py:479
    word_metric: str = "angular"
    a: float = 1e-3


def _legacy_heads(params):
    """Bimodal params → closed-form head layout ((in, out) weights)."""
    return {
        mod: {
            "w_mu": params[mod]["mu"]["w"],
            "b_mu": params[mod]["mu"]["b"],
            "w_log_sigma": params[mod]["log_sigma"]["w"],
            "b_log_sigma": params[mod]["log_sigma"]["b"],
        }
        for mod in ("audio", "visual")
    }


def joint_log_prob_old(
    params, latents, b: Mapping[str, jax.Array], vocab_emb, word_loss_weight,
    spec: AlternatingFitSpec,
):
    """Old-style 2-modality objective (losses.py:153-214)."""
    (a_mu, a_sig), (v_mu, v_sig) = apply_audio_visual_generator(params, latents)
    word_fn = (
        word_logprob_angular if spec.word_metric == "angular" else word_logprob_dot_prod
    )
    sent = b["text"] if "text" in b else vocab_emb[b["text_ids"]]
    word_lp = word_fn(
        latents, vocab_emb, b["text_weights"], sent, b["text_mask"], a=spec.a
    )
    audio_lp = gaussian_logpdf_masked(a_mu, a_sig, b["audio"], b["audio_mask"])
    visual_lp = gaussian_logpdf_masked(v_mu, v_sig, b["visual"], b["visual_mask"])
    w = jnp.asarray(word_loss_weight)
    half = (1.0 - w) / 2.0  # losses.py:207-210
    return half * audio_lp + half * visual_lp + w * word_lp


def estimate_latents(params, data, sentence_weights, sent_embeddings):
    """Closed-form estimate through the bimodal decoder (sif2.py:164-208
    semantics restricted to the {audio, visual} heads; per-row L2 norm)."""
    return closed_form_latents(
        {"audio": data["audio"], "visual": data["visual"]},
        _legacy_heads(params),
        sentence_weights,
        sent_embeddings,
    )


def fit_alternating(
    params,
    data: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    lr,
    word_loss_weight,
    spec: AlternatingFitSpec = AlternatingFitSpec(),
):
    """Alternate closed-form latent estimation with decoder SGD.

    Returns ``(final_latents, params, epoch_losses)``.

    ``data`` uses the same dict convention as ``mmtpu.train.latents``
    (text_ids or pre-gathered text / text_weights / text_mask / audio /
    audio_mask / visual / visual_mask); with ids, per-token vectors are
    gathered from ``vocab_emb`` inside the step.
    """
    data = dict(data)
    if "text" not in data:  # ids-stream convention (prepare_device_data)
        data["text"] = jnp.asarray(vocab_emb)[jnp.asarray(data["text_ids"])]
    n = data["audio"].shape[0]
    bsz = spec.batch_size
    n_batches = -(-n // bsz)
    pad = n_batches * bsz - n
    idx = jnp.concatenate([jnp.arange(n), jnp.zeros((pad,), jnp.int32)])
    idx = idx.reshape(n_batches, bsz)
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    ).reshape(n_batches, bsz)
    lr = jnp.asarray(lr)

    def epoch(params, _):
        latents = estimate_latents(
            params, data, data["text_weights"], data["text"]
        )

        def batch_step(p, xs):
            j, rv = xs
            b = {k: v[j] for k, v in data.items()}

            def loss_fn(p):
                lp = joint_log_prob_old(
                    p, latents[j], b, vocab_emb, word_loss_weight, spec
                )
                return jnp.sum(-lp * rv) / jnp.maximum(jnp.sum(rv), 1.0)

            loss, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree.map(lambda a, ga: a - lr * ga, p, g)
            return p, loss

        params, losses = jax.lax.scan(batch_step, params, (idx, valid))
        return params, jnp.sum(losses)

    params, epoch_losses = jax.lax.scan(epoch, params, None, length=spec.n_epochs)
    final = estimate_latents(params, data, data["text_weights"], data["text"])
    return final, params, epoch_losses

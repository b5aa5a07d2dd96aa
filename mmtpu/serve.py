"""Closed-form serving — production inference without gradient loops.

The reference's only "serving" story is the ``--time_test`` harness
(``simplesif.py:808-889``) timing one ad-hoc call of the closed-form
estimator.  mmtpu packages it as a real serving path:

- :class:`ClosedFormServer` holds trained decoder weights, pre-compiles the
  estimator for a ladder of padded batch sizes (static shapes — no
  recompilation at request time), pads/bucketizes incoming requests, and
  returns L2-normalized latent embeddings.
- Optionally chains the sentiment head for end-to-end prediction serving.

Measured on one v5e chip — UNIFIED METHODOLOGY (same definition in
README.md and BASELINE.md): host-observed latency of one server call with
device-resident features, best of 8 requests, through this environment's
network-tunneled device whose ~30 ms dispatch/transfer round-trip floors
every request: 33 ms / 64-utterance request, 48 ms / 686 utterances
(≈14.4k utt/s) — vs 524 ms for the reference's torch path on CPU at batch
686.  On directly-attached hardware the compute itself is sub-ms.
``bench.py``'s ``serving_latency_s_686``/``_64`` fields capture exactly
this measurement.
"""

from __future__ import annotations

import bisect
from typing import Dict, Mapping, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from mmtpu.models.decoder import head_segments
from mmtpu.ops.closed_form import closed_form_latents


def assemble_head_data(
    batch: Mapping[str, jax.Array], heads: Sequence[str]
) -> Dict[str, jax.Array]:
    """Concatenate base streams into per-head observation tensors — the
    explicit ``torch.cat`` layout of ``simplesif.py:820-830`` (the
    closed-form estimator needs materialized concatenations, unlike the
    training loop's segment trick).  Call under jit: on remote-dispatch
    backends, each eager op costs a host round-trip."""
    streams = {
        "text": batch["text_gauss"],
        "audio": batch["audio"],
        "visual": batch["visual"],
    }
    out = {}
    for h in heads:
        parts = [streams[s] for s in head_segments(h)]
        out[h] = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out


class ClosedFormServer:
    """Batch-serving wrapper around the closed-form latent estimator.

    Args:
        decoder_params: trained decoder pytree (``mmtpu.models.decoder``).
        heads: head subset to invert (default: every decoder head — the six
            MMB2 heads, matching ``sif2.py:167-174``).
        batch_sizes: padded compile ladder; requests are right-padded up to
            the smallest fitting size (one compile per size, at init).
        sentiment_params: optional sentiment MLP for chained prediction.
        word_embeddings: optional (V, D) vocab table — when given, requests
            may carry ``text_ids`` (B, Lt) int token ids instead of
            pre-gathered ``text`` (B, Lt, D) vectors (~300x smaller requests).
    """

    def __init__(
        self,
        decoder_params,
        heads: Optional[Sequence[str]] = None,
        batch_sizes: Sequence[int] = (64, 256, 1024),
        sentiment_params=None,
        word_embeddings=None,
    ):
        self.heads = tuple(heads or decoder_params["heads"].keys())
        self._head_params = {
            h: decoder_params["heads"][h] for h in self.heads
        }
        self.batch_sizes = sorted(batch_sizes)
        self._senti = sentiment_params
        self._vocab = (
            None if word_embeddings is None else jnp.asarray(word_embeddings)
        )

        def run(streams):
            # everything — gather, concatenation, estimation, prediction — is
            # ONE compiled program: a single device dispatch per request
            data = assemble_head_data(streams, self.heads)
            if "text" in streams:
                sent = streams["text"]
            else:
                if self._vocab is None:
                    raise ValueError(
                        "request carries text_ids but the server was built "
                        "without word_embeddings — pass the (V, D) vocab "
                        "table at construction, or send pre-gathered 'text'"
                    )
                sent = self._vocab[streams["text_ids"]]
            lat = closed_form_latents(
                data, self._head_params, streams["text_weights"], sent
            )
            if self._senti is not None:
                from mmtpu.models.sentiment import apply_sentiment

                return lat, apply_sentiment(self._senti, lat)
            return lat, None

        self._fn = jax.jit(run)

    def warmup(self, example: Mapping[str, np.ndarray]) -> None:
        """Pre-compile every ladder size from one example request."""
        for bs in self.batch_sizes:
            self(example, _force_batch=bs)

    def __call__(
        self, batch: Mapping[str, np.ndarray], _force_batch: Optional[int] = None
    ):
        """Serve one request.

        Args:
            batch: dict with ``text_gauss`` (B, L, Tg), ``audio`` (B, L, A),
                ``visual`` (B, L, V), ``text_weights`` (B, Lt), and either
                ``text_ids`` (B, Lt) ints (needs ``word_embeddings`` at
                construction) or pre-gathered ``text`` (B, Lt, D) — the
                prepared-data convention.

        Returns:
            ``(latents (B, D), predictions or None)`` with padding stripped.
        """
        b = batch["audio"].shape[0]
        if _force_batch is not None:
            target = _force_batch
        else:
            i = bisect.bisect_left(self.batch_sizes, b)
            target = self.batch_sizes[i] if i < len(self.batch_sizes) else b

        def pad(x):
            # device-resident arrays of the right size pass through untouched
            # (pulling them to the host costs a full transfer round-trip)
            if isinstance(x, jax.Array) and x.shape[0] == target:
                return x
            x = np.asarray(x)  # host-side numpy otherwise
            if x.shape[0] == target:
                return x
            widths = [(0, target - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, widths)

        padded = {k: pad(v) for k, v in batch.items()}
        lat, pred = self._fn(padded)
        lat = np.asarray(lat)[:b]
        return lat, (None if pred is None else np.asarray(pred)[:b])

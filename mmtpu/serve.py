"""Closed-form serving — production inference without gradient loops.

The reference's only "serving" story is the ``--time_test`` harness
(``simplesif.py:808-889``) timing one ad-hoc call of the closed-form
estimator.  mmtpu packages it as a real serving path:

- :class:`ClosedFormServer` holds trained decoder weights, pre-compiles the
  estimator for a ladder of padded batch sizes (static shapes — no
  recompilation at request time), pads/bucketizes incoming requests, and
  returns L2-normalized latent embeddings.
- Optionally chains the sentiment head for end-to-end prediction serving.
- Requests may arrive pre-compressed to Gaussian sufficient statistics
  (:func:`stats_request`, ~L-fold smaller payloads): the estimator only
  ever consumes sequence-summed inverse weights, which the statistics
  determine exactly (``mmtpu.ops.closed_form.seq_summed_inverse_weights``).
  Unmasked by default — bit-matching the raw estimator, which faithfully
  ignores masks (``sif2.py:103-114``).

Measured on one v5e chip — UNIFIED METHODOLOGY (same definition in
README.md and BASELINE.md): host-observed latency of one server call with
device-resident features, best of 8 requests, through this environment's
network-tunneled device whose ~30 ms dispatch/transfer round-trip floors
every request: **32.3 ms / 64-utterance request, 50.9 ms / 686 utterances
(≈13.5k utt/s)** — vs 524 ms for the reference's torch path on CPU at
batch 686.  On directly-attached hardware the compute itself is sub-ms.
Host-resident requests (features cross the tunnel per call): raw 431.5 ms
vs suff-stats-compressed 108.1 ms at batch 686 — the compression is a 4×
end-to-end win when the payload rides the wire.  Artifact:
``bench.py``'s ``serving_latency_s_686``/``_64``/``_host``/``_stats``
fields (captured 2026-08-18, ``docs/selfcaptures/bench_2026-08-18_r5.json``).
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


def stats_request(
    batch: Mapping[str, np.ndarray],
    masks: Optional[Mapping[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Compress a raw serving request to sufficient statistics, host-side.

    Replaces each ``(B, L, F)`` Gaussian stream with its ``(B, F)``
    ``_s0/_s1/_s2`` triplet — an ~L/3-fold payload reduction on those
    streams (MOSI L=20: ~6.7x; POM's long stream is the token ids, which
    already ship as compact ints) that matters whenever requests cross a
    network link to the accelerator host.  The word-likelihood inputs
    (``text_ids``/``text`` + ``text_weights``) pass through.

    ``masks=None`` (default) sums ALL timesteps — exactly what the raw
    estimator does with its ignored mask argument (``sif2.py:103-114``), so
    the server's stats path returns bit-equal-math results to the raw path.
    Pass per-stream masks to exclude padding instead (a deliberate,
    documented deviation — the better estimate, not the reference one).
    """
    out: Dict[str, np.ndarray] = {
        k: np.asarray(batch[k])
        for k in ("text_ids", "text", "text_weights") if k in batch
    }
    for stream in ("text_gauss", "audio", "visual"):
        x = np.asarray(batch[stream])
        m = None if masks is None else masks.get(stream)
        if m is None:
            s0 = np.full(x.shape[:1] + x.shape[2:], x.shape[1], np.float32)
            xd = x.astype(np.float64)
            s1 = xd.sum(1).astype(np.float32)
            s2 = (xd * xd).sum(1).astype(np.float32)
        else:
            m3 = np.asarray(m)
            if m3.ndim == 2:
                m3 = m3[:, :, None]
            mv = (m3 * x).astype(np.float64)
            s0 = np.broadcast_to(m3, x.shape).sum(1).astype(np.float32)
            s1 = mv.sum(1).astype(np.float32)
            s2 = (mv * x).sum(1).astype(np.float32)
        out[f"{stream}_s0"], out[f"{stream}_s1"], out[f"{stream}_s2"] = \
            s0, s1, s2
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

        def chain(lat):
            if self._senti is not None:
                from mmtpu.models.sentiment import apply_sentiment

                return lat, apply_sentiment(self._senti, lat)
            return lat, None

        def sent_of(streams):
            if "text" in streams:
                return streams["text"]
            if self._vocab is None:
                raise ValueError(
                    "request carries text_ids but the server was built "
                    "without word_embeddings — pass the (V, D) vocab "
                    "table at construction, or send pre-gathered 'text'"
                )
            return self._vocab[streams["text_ids"]]

        def run(streams):
            # everything — gather, concatenation, estimation, prediction — is
            # ONE compiled program: a single device dispatch per request
            data = assemble_head_data(streams, self.heads)
            lat = closed_form_latents(
                data, self._head_params, streams["text_weights"],
                sent_of(streams)
            )
            return chain(lat)

        def run_stats(req):
            # suff-stats request (stats_request): same estimate, ~L-fold
            # smaller payload — the sums the estimator needs are determined
            # exactly by the statistics
            from mmtpu.train.warm_start import closed_form_latents_from_stats

            sent_of(req)  # surface the missing-vocab error before tracing
            lat = closed_form_latents_from_stats(
                {"heads": dict(self._head_params)}, req, self._vocab,
                heads=self.heads,
            )
            return chain(lat)

        self._fn = jax.jit(run)
        self._fn_stats = jax.jit(run_stats)

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
                prepared-data convention.  Alternatively a compressed
                request from :func:`stats_request` (``<stream>_s0/s1/s2``
                (B, F) triplets instead of the raw streams) — detected by
                the ``audio_s0`` key, served by a separately-compiled
                program on the same padding ladder.

        Returns:
            ``(latents (B, D), predictions or None)`` with padding stripped.
        """
        b = batch["audio_s0" if "audio_s0" in batch else "audio"].shape[0]
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
        fn = self._fn_stats if "audio_s0" in batch else self._fn
        lat, pred = fn(padded)
        lat = np.asarray(lat)[:b]
        return lat, (None if pred is None else np.asarray(pred)[:b])

"""Legacy / auxiliary model family (SURVEY.md §2 row 9).

Functional equivalents of the reference's secondary models:

- :func:`init_audio_visual_generator` / :func:`apply_audio_visual_generator`
  — the bimodal-only ``AudioVisualGenerator`` (``models.py:204-253``) used by
  the legacy ``sif2.py`` driver.
- :func:`init_concat_generator` / :func:`apply_concat_generator` —
  ``AudioVisualGeneratorConcat`` (``models.py:5-49``): separate audio/visual
  latent slices with their own heads, plus the random-slice latent
  initializer (``models.py:42-49``).
- :func:`init_autoencoder` / :func:`apply_autoencoder` — the 2-layer MLP
  ``Autoencoder`` (``models.py:51-70``).
- :func:`init_lstm_autoencoder` / :func:`apply_lstm_autoencoder` —
  ``LSTMAutoencoder`` (``models.py:72-105``): LSTM encoder + teacher-forced
  LSTM decoder, expressed as ``lax.scan`` (TPU-friendly; no per-step python).

The reference never instantiates the two autoencoders from any driver (dead
code upstream); they are provided for API completeness.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmtpu.models.init import torch_linear_init


# ---------------------------------------------------------------- bimodal ---

def init_audio_visual_generator(key, embed_dim, audio_dim, visual_dim):
    """models.py:204-220: {audio, visual} x {mu, log_sigma} linear heads."""
    ks = jax.random.split(key, 4)
    return {
        "audio": {
            "mu": torch_linear_init(ks[0], embed_dim, audio_dim),
            "log_sigma": torch_linear_init(ks[1], embed_dim, audio_dim),
        },
        "visual": {
            "mu": torch_linear_init(ks[2], embed_dim, visual_dim),
            "log_sigma": torch_linear_init(ks[3], embed_dim, visual_dim),
        },
    }


def apply_audio_visual_generator(params, embeddings):
    """models.py:241-253 — returns ((audio_mu, audio_sigma), (visual_mu,
    visual_sigma)) with sigma already exponentiated."""
    out = []
    for mod in ("audio", "visual"):
        mu = embeddings @ params[mod]["mu"]["w"] + params[mod]["mu"]["b"]
        sigma = jnp.exp(
            embeddings @ params[mod]["log_sigma"]["w"] + params[mod]["log_sigma"]["b"]
        )
        out.append((mu, sigma))
    return tuple(out)


# ----------------------------------------------------------------- concat ---

def init_concat_generator(key, audio_embed_dim, visual_embed_dim, audio_dim,
                          visual_dim):
    """models.py:5-21: heads over separate audio/visual latent slices."""
    ks = jax.random.split(key, 4)
    return {
        "audio_embed_dim": audio_embed_dim,
        "visual_embed_dim": visual_embed_dim,
        "audio": {
            "mu": torch_linear_init(ks[0], audio_embed_dim, audio_dim),
            "log_sigma": torch_linear_init(ks[1], audio_embed_dim, audio_dim),
        },
        "visual": {
            "mu": torch_linear_init(ks[2], visual_embed_dim, visual_dim),
            "log_sigma": torch_linear_init(ks[3], visual_embed_dim, visual_dim),
        },
    }


def apply_concat_generator(params, audio_embed, visual_embed):
    """models.py:33-40."""
    a_mu = audio_embed @ params["audio"]["mu"]["w"] + params["audio"]["mu"]["b"]
    a_sig = jnp.exp(
        audio_embed @ params["audio"]["log_sigma"]["w"]
        + params["audio"]["log_sigma"]["b"]
    )
    v_mu = visual_embed @ params["visual"]["mu"]["w"] + params["visual"]["mu"]["b"]
    v_sig = jnp.exp(
        visual_embed @ params["visual"]["log_sigma"]["w"]
        + params["visual"]["log_sigma"]["b"]
    )
    return (a_mu, a_sig), (v_mu, v_sig)


def concat_init_embeddings(key, word_embeddings, audio_embed_dim, visual_embed_dim):
    """models.py:42-49: word embeddings ++ random audio/visual latent slices."""
    n = word_embeddings.shape[0]
    k1, k2 = jax.random.split(key)
    aud = jax.random.normal(k1, (n, audio_embed_dim), jnp.float32)
    vis = jax.random.normal(k2, (n, visual_embed_dim), jnp.float32)
    return jnp.concatenate([word_embeddings, aud, vis], axis=1)


# ------------------------------------------------------------ autoencoder ---

def init_autoencoder(key, latent_dim, hidden_dim, embedding_dim, audio_dim,
                     visual_dim):
    """models.py:51-61."""
    out_dim = embedding_dim + audio_dim + visual_dim
    ks = jax.random.split(key, 4)
    return {
        "encoder": torch_linear_init(ks[0], out_dim, hidden_dim),
        "encoder2": torch_linear_init(ks[1], hidden_dim, latent_dim),
        "decoder": torch_linear_init(ks[2], latent_dim, hidden_dim),
        "decoder2": torch_linear_init(ks[3], hidden_dim, out_dim),
    }


def apply_autoencoder(params, inputs) -> Tuple[jax.Array, jax.Array]:
    """models.py:63-70 — returns (latent, reconstruction)."""
    h = jax.nn.relu(inputs @ params["encoder"]["w"] + params["encoder"]["b"])
    latent = h @ params["encoder2"]["w"] + params["encoder2"]["b"]
    h2 = jax.nn.relu(latent @ params["decoder"]["w"] + params["decoder"]["b"])
    out = h2 @ params["decoder2"]["w"] + params["decoder2"]["b"]
    return latent, out


# ------------------------------------------------------- lstm autoencoder ---

def _init_lstm(key, in_dim, hidden_dim):
    """torch nn.LSTM single-layer init: all weights/biases U(-k, k),
    k = 1/sqrt(hidden_dim)."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, jnp.float32))
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(ks[0], (in_dim, 4 * hidden_dim)),
        "w_hh": u(ks[1], (hidden_dim, 4 * hidden_dim)),
        "b_ih": u(ks[2], (4 * hidden_dim,)),
        "b_hh": u(ks[3], (4 * hidden_dim,)),
    }


def _lstm_cell(params, x, h, c):
    gates = x @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order i, f, g, o
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2


def _lstm_scan(params, xs, h0, c0):
    def step(carry, x):
        h, c = carry
        h2, c2 = _lstm_cell(params, x, h, c)
        return (h2, c2), h2

    (h, c), ys = jax.lax.scan(step, (h0, c0), xs)
    return ys, (h, c)


def init_lstm_autoencoder(key, latent_dim, embedding_dim, audio_dim, visual_dim):
    """models.py:72-81."""
    out_dim = embedding_dim + audio_dim + visual_dim
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": _init_lstm(k1, out_dim, latent_dim),
        "decoder": _init_lstm(k2, out_dim, latent_dim),
        "pred": torch_linear_init(k3, latent_dim, out_dim),
    }


def apply_lstm_autoencoder(params, inputs):
    """models.py:83-105: encode the sequence; decode teacher-forced (the
    decoder input at step i is the ORIGINAL input at step i-1, zeros first),
    projecting each hidden state to a reconstruction.

    Args:
        inputs: ``(B, L, F)``.

    Returns:
        ``(latents (B, latent_dim), reconstruction (B, L, F))``.
    """
    b, seq_len, f = inputs.shape
    latent_dim = params["pred"]["w"].shape[0]
    xs = jnp.swapaxes(inputs, 0, 1)  # (L, B, F) — scan over time
    h0 = jnp.zeros((b, latent_dim), inputs.dtype)
    c0 = jnp.zeros_like(h0)
    _, (h_enc, c_enc) = _lstm_scan(params["encoder"], xs, h0, c0)

    # teacher-forced decoder inputs: [zeros, x_0, x_1, ..., x_{L-2}]
    dec_in = jnp.concatenate([jnp.zeros((1, b, f), inputs.dtype), xs[:-1]], axis=0)
    ys, _ = _lstm_scan(params["decoder"], dec_in, h_enc, c_enc)
    recon = ys @ params["pred"]["w"] + params["pred"]["b"]  # (L, B, F)
    return h_enc, jnp.swapaxes(recon, 0, 1)

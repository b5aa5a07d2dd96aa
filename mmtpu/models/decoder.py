"""MMB1/MMB2 generative decoder as a functional parameter pytree.

TPU-native equivalent of reference ``models.py:107-202``
(``AudioVisualGeneratorMultimodal``): per-modality-subset pairs of linear
heads predicting the mean and log-stdev of diagonal Gaussians, with an
optional LayerNorm / BatchNorm on the latent before the heads.

Design notes (TPU-first):

- Parameters are a plain pytree ``{"heads": {name: {w_mu, b_mu, w_log_sigma,
  b_log_sigma}}, "norm": {scale, bias}}`` — vmappable along a leading config
  axis for the in-process hyperparameter sweep.
- The norm selection is *branchless* (compute all three, select by code) so
  configs with different ``norm`` settings can share one compiled program
  under ``vmap`` (reference picks the module at construction,
  ``models.py:161-168``).
- Heads over concatenated modalities ("textaudio", ...) do NOT require
  concatenated data tensors: each head is described by its base-stream
  segments (see :func:`head_segments`) and the training loop slices the
  head's mu/sigma per segment, which is mathematically identical to the
  reference's explicit ``torch.cat`` batches (``simplesif.py:93-113``) while
  avoiding ~4x duplicated HBM traffic.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax
import jax.numpy as jnp

from mmtpu.models.init import torch_linear_init

MMB1_HEADS: Tuple[str, ...] = ("audio", "visual")
MMB2_HEADS: Tuple[str, ...] = (
    "audio",
    "visual",
    "audiovisual",
    "textaudio",
    "textvisual",
    "textaudiovisual",
)

_SEGMENTS = {
    "audio": ("audio",),
    "visual": ("visual",),
    "audiovisual": ("audio", "visual"),
    "textaudio": ("text", "audio"),
    "textvisual": ("text", "visual"),
    "textaudiovisual": ("text", "audio", "visual"),
}

NORM_NONE = 0
NORM_LAYER = 1
NORM_BATCH = 2
NORM_CODES = {None: NORM_NONE, "layer_norm": NORM_LAYER, "batch_norm": NORM_BATCH}

_NORM_EPS = 1e-5  # torch LayerNorm / BatchNorm1d default


def head_segments(head: str) -> Tuple[str, ...]:
    """Base-stream composition of a head ("text" = the Gaussian text stream,
    which is the warped GloVe sequence for MOSI and the aligned embeddings for
    POM/IEMOCAP — ``simplesif.py:86-91``)."""
    return _SEGMENTS[head]

def head_dims(head: str, text_dim: int, audio_dim: int, visual_dim: int) -> int:
    """Output feature dim of a head (reference ``models.py:134-159``)."""
    sizes = {"text": text_dim, "audio": audio_dim, "visual": visual_dim}
    return sum(sizes[s] for s in head_segments(head))


def init_decoder(
    key: jax.Array,
    embed_dim: int,
    audio_dim: int,
    visual_dim: int,
    unimodal: bool = False,
    text_dim: int | None = None,
    dtype=jnp.float32,
) -> dict:
    """Initialize decoder parameters (torch-Linear init law).

    Matches reference ``models.py:107-168``: MMB1 (``unimodal=True``) builds
    only the {audio, visual} heads; MMB2 adds every pair and the triple.  The
    text segment of concatenated heads uses ``embedding_dim`` in the reference
    (``models.py:148``) — identical to the latent dim; ``text_dim`` allows
    overriding for the POM aligned-text stream.

    Norm parameters (scale=1, bias=0 — torch default affine init) are always
    allocated so the pytree structure is norm-independent (branchless sweep).
    """
    if text_dim is None:
        text_dim = embed_dim
    heads = MMB1_HEADS if unimodal else MMB2_HEADS
    params: dict = {"heads": {}, "norm": {
        "scale": jnp.ones((embed_dim,), dtype),
        "bias": jnp.zeros((embed_dim,), dtype),
    }}
    keys = jax.random.split(key, 2 * len(heads))
    for i, name in enumerate(heads):
        out_dim = head_dims(name, text_dim, audio_dim, visual_dim)
        mu = torch_linear_init(keys[2 * i], embed_dim, out_dim, dtype)
        ls = torch_linear_init(keys[2 * i + 1], embed_dim, out_dim, dtype)
        params["heads"][name] = {
            "w_mu": mu["w"], "b_mu": mu["b"],
            "w_log_sigma": ls["w"], "b_log_sigma": ls["b"],
        }
    return params


def is_stacked(params: Mapping) -> bool:
    """True for the stacked-weight layout (one GEMM for all heads)."""
    return "w_mu" in params["heads"]


def stack_decoder(params: Mapping, pad_to: int = 0):
    """Per-head pytree → stacked layout: the 2·n_heads linear layers become
    ONE ``(D, ΣF_h)`` weight pair, so every step runs a single wide GEMM on
    the MXU instead of n_heads skinny ones, and the decoder optimizer state
    is 4 large leaves instead of 4·n_heads small ones (better XLA fusion of
    Adam moment updates).  Stacking is done ONCE per fit (outside the scan) —
    a per-step weight concat was measured SLOWER (see apply_decoder note).

    Returns ``(stacked_params, head_order)`` where ``head_order`` is the
    static tuple of head names in stack order (MMB head order).  Exact: each
    head's output columns are the same dot products as its standalone GEMM.

    Works under a leading config axis (sweep-vmapped params): weights concat
    on the last axis.

    ``pad_to > 0`` zero-pads the stacked feature axis to a multiple of
    ``pad_to`` (the fused decoder-update kernel's F tile,
    ``mmtpu.kernels.decoder_update``).  Zero-pad columns are inert: their
    pre-activations are never sliced by any head, their gradients are
    exactly zero, and a zero Adam/SGD column stays zero — so
    :func:`unstack_decoder` (which slices only the true widths) recovers
    the identical per-head pytree.
    """
    order = tuple(h for h in MMB2_HEADS if h in params["heads"])
    hs = params["heads"]

    def cat(k):
        out = jnp.concatenate([jnp.asarray(hs[h][k]) for h in order], axis=-1)
        if pad_to:
            pad = (-out.shape[-1]) % pad_to
            if pad:
                widths = [(0, 0)] * out.ndim
                widths[-1] = (0, pad)
                out = jnp.pad(out, widths)
        return out

    stacked = {
        "heads": {k: cat(k)
                  for k in ("w_mu", "b_mu", "w_log_sigma", "b_log_sigma")},
        "norm": params["norm"],
    }
    return stacked, order


def unstack_decoder(stacked: Mapping, head_widths) -> dict:
    """Inverse of :func:`stack_decoder`; ``head_widths`` is a static sequence
    of ``(head_name, F_h)`` in stack order."""
    hs = stacked["heads"]
    out: dict = {"heads": {}, "norm": stacked["norm"]}
    ofs = 0
    for name, f in head_widths:
        out["heads"][name] = {
            k: jax.lax.slice_in_dim(hs[k], ofs, ofs + f, axis=hs[k].ndim - 1)
            for k in ("w_mu", "b_mu", "w_log_sigma", "b_log_sigma")
        }
        ofs += f
    return out


def apply_decoder_stacked(
    params: Mapping, latents: jax.Array, norm_code=NORM_NONE, batch_weights=None
) -> Tuple[jax.Array, jax.Array]:
    """Stacked-layout forward: ``(mu_all, sigma_all)``, each ``(B, ΣF_h)``;
    callers slice per head at the static offsets (same head order as
    :func:`stack_decoder`)."""
    x = apply_norm(latents, params["norm"], norm_code, batch_weights)
    hs = params["heads"]
    mu = x @ hs["w_mu"] + hs["b_mu"]
    sigma = jnp.exp(x @ hs["w_log_sigma"] + hs["b_log_sigma"])
    return mu, sigma


def apply_norm(
    x: jax.Array, norm_params: Mapping[str, jax.Array], norm_code, batch_weights=None
) -> jax.Array:
    """Branchless none / LayerNorm / train-mode-BatchNorm on ``(B, D)``.

    Reference semantics: LayerNorm over the feature dim (``models.py:164``);
    BatchNorm1d in *training mode everywhere* — the reference never calls
    ``.eval()``, so batch statistics are always used, including on the
    valid/test latent fits (``simplesif.py:148-158``).  Both use biased
    variance and eps=1e-5 with learnable scale/bias.

    Args:
        batch_weights: optional ``(B,)`` 0/1 row-validity weights.  mmtpu pads
            the last minibatch to a static batch size; weighted batch
            statistics reproduce the reference's shrunken final batch exactly.
    """
    scale, bias = norm_params["scale"], norm_params["bias"]
    ln_mean = jnp.mean(x, axis=-1, keepdims=True)
    ln_var = jnp.var(x, axis=-1, keepdims=True)
    ln = (x - ln_mean) / jnp.sqrt(ln_var + _NORM_EPS) * scale + bias
    if batch_weights is None:
        bn_mean = jnp.mean(x, axis=0, keepdims=True)
        bn_var = jnp.var(x, axis=0, keepdims=True)
    else:
        w = batch_weights[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        bn_mean = jnp.sum(x * w, axis=0, keepdims=True) / denom
        bn_var = jnp.sum(jnp.square(x - bn_mean) * w, axis=0, keepdims=True) / denom
    bn = (x - bn_mean) / jnp.sqrt(bn_var + _NORM_EPS) * scale + bias
    code = jnp.asarray(norm_code)
    return jnp.where(code == NORM_LAYER, ln, jnp.where(code == NORM_BATCH, bn, x))


def apply_decoder(
    params: Mapping, latents: jax.Array, norm_code=NORM_NONE, batch_weights=None
) -> dict:
    """Forward pass: latent → per-head Gaussian parameters.

    Matches reference ``models.py:187-202``: optional norm on the latent, then
    ``mu = Linear(x)`` and ``sigma = exp(Linear(x))`` per head.

    Returns ``{head: {"mu": (B, F_h), "sigma": (B, F_h)}}``.
    """
    x = apply_norm(latents, params["norm"], norm_code, batch_weights)
    out = {}
    # NB: packing the 12 per-head linears into one (D, 2·ΣF_h) GEMM via a
    # per-step weight concat was tried and MEASURED SLOWER on a v5e (7.32 s
    # vs 6.20 s per 32-config sweep chunk): the trained weights change every
    # step, so the concat re-materializes ~3.4 MB/config/step of weight
    # traffic — more than the small-matmul launch overhead it removes.
    for name, h in params["heads"].items():
        mu = x @ h["w_mu"] + h["b_mu"]
        sigma = jnp.exp(x @ h["w_log_sigma"] + h["b_log_sigma"])
        out[name] = {"mu": mu, "sigma": sigma}
    return out

"""Fused Pallas kernel for the angular word-likelihood partition.

``Z_s = sum_v (1 - acos(cos(latent, v)) / pi)`` over the whole vocabulary
(reference ``losses.py:76-78``) is the dominant FLOPs of every MMB training
step: an O(B·V·D) matmul followed by elementwise arccos and a vocab-axis
reduction.  This kernel fuses normalize → matmul (MXU) → arccos (VPU) →
reduce in one VMEM-resident pass over vocab tiles, and its custom VJP
*recomputes* the cosines tile-by-tile instead of materializing the (B, V)
similarity matrix as an autodiff residual — O(B·D) memory instead of O(B·V),
which matters when a vmapped sweep multiplies every residual by the config
count.

The vocabulary table is a non-differentiable constant here (the reference
never trains word embeddings), so the VJP returns a latent cotangent only.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_PI = math.pi
_COS_EPS = 1e-8  # torch CosineSimilarity denominator clamp (losses.py:74)
_ACOS_CLIP = 1e-7
_DEFAULT_TILE = 512


def pallas_available() -> bool:
    """True when running on a TPU backend where Mosaic kernels compile."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# Minimum effective row count (configs x batch under a vmapped sweep) for the
# fused kernel to be the default.  Measured on a v5e (scripts/diag_b64_pallas
# .py, 2026-08-17): at 64 rows the kernel is PARITY with XLA (1.007 s vs
# 1.025 s per 100-epoch fit — within relay noise), while on 2048-row sweep
# chunks it wins 13-29% end-to-end (docs/DESIGN.md).  Below the threshold we
# skip the extra Mosaic compile for a wash.
MIN_PALLAS_ROWS = 256


def default_partition_fn(rows: int):
    """Shape-aware production default: the fused Pallas kernel when the
    effective row count amortizes it, else None (XLA ``angular_partition``)."""
    if pallas_available() and rows >= MIN_PALLAS_ROWS:
        return angular_partition_pallas
    return None


def _acos(x):
    """arccos for Mosaic (no native lowering): Abramowitz & Stegun 4.4.45,
    |err| < 2e-8 — below float32 noise.  acos(x) = sqrt(1-x)·P(x) on [0, 1],
    reflected via acos(-x) = pi - acos(x)."""
    a = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * a + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * p
    return jnp.where(x < 0, _PI - r, r)


def _fwd_kernel(lat_ref, vocab_ref, vnorm_ref, out_ref, *, v_total, tile):
    """One (row tile, vocab tile): accumulate sum_v (1 - acos(cos)/pi)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lat = lat_ref[:, :]  # (B, D)
    tile_v = vocab_ref[:, :]  # (TV, D)
    lnorm = jnp.sqrt(jnp.sum(lat * lat, axis=-1, keepdims=True))  # (B, 1)
    vnorm = vnorm_ref[:, :]  # (1, TV) precomputed row norms
    dots = jax.lax.dot_general(
        lat, tile_v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TV)
    cos = dots / jnp.maximum(lnorm * vnorm, _COS_EPS)
    cos = jnp.clip(cos, -1.0 + _ACOS_CLIP, 1.0 - _ACOS_CLIP)
    val = 1.0 - _acos(cos) / _PI
    # mask tile padding beyond the true vocab size
    col = jax.lax.broadcasted_iota(jnp.int32, val.shape, dimension=1)
    valid = (j * tile + col) < v_total
    val = jnp.where(valid, val, 0.0)
    out_ref[:, :] += jnp.sum(val, axis=-1, keepdims=True)


def _bwd_kernel(lat_ref, vocab_ref, vnorm_ref, g_ref, dlat_ref, *, v_total, tile):
    """One vocab tile of the latent cotangent (recompute, no residuals).

    d/dl [1 - acos(cos)/pi] = (1/pi) / sqrt(1-cos^2) * (v/(|l||v|) - cos*l/|l|^2)
    """
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dlat_ref[:, :] = jnp.zeros_like(dlat_ref)

    lat = lat_ref[:, :]  # (B, D)
    tile_v = vocab_ref[:, :]  # (TV, D)
    lnorm_sq = jnp.sum(lat * lat, axis=-1, keepdims=True)  # (B, 1)
    lnorm = jnp.sqrt(lnorm_sq)
    vnorm = vnorm_ref[:, :]  # (1, TV)
    dots = jax.lax.dot_general(
        lat, tile_v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    denom = jnp.maximum(lnorm * vnorm, _COS_EPS)
    cos = jnp.clip(dots / denom, -1.0 + _ACOS_CLIP, 1.0 - _ACOS_CLIP)
    w = (1.0 / _PI) / jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))  # (B, TV)
    col = jax.lax.broadcasted_iota(jnp.int32, w.shape, dimension=1)
    w = jnp.where((j * tile + col) < v_total, w, 0.0)
    g = g_ref[:, :]  # (B, 1) upstream cotangent
    wg = w * g
    # term 1: (wg / (|l||v|)) @ v
    t1 = jax.lax.dot_general(
        wg / denom, tile_v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, D)
    # term 2: -(sum_v wg*cos) * l / |l|^2
    s = jnp.sum(wg * cos, axis=-1, keepdims=True)  # (B, 1)
    dlat_ref[:, :] += t1 - s * lat / jnp.maximum(lnorm_sq, _COS_EPS)


def _pad_dim(x, multiple, axis):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_ROW_TILE = 1024  # bounds VMEM when flattened sweep rows run through one call


def _row_tiling(latents):
    """(padded latents, row-tile size, n row tiles) — rows beyond the true
    count are zero padding, sliced off after the call."""
    b = latents.shape[0]
    rt = min(_ROW_TILE, b + (-b) % 8)
    lat_p = _pad_dim(latents, rt, 0)
    return lat_p, rt, lat_p.shape[0] // rt


def _call_fwd(latents, vocab, vnorm, tile):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v_total = vocab.shape[0]
    vocab_p = _pad_dim(vocab, tile, 0)
    vnorm_p = _pad_dim(vnorm[None, :], tile, 1)
    n_tiles = vocab_p.shape[0] // tile
    d = vocab_p.shape[1]
    b = latents.shape[0]
    lat_p, rt, n_rt = _row_tiling(latents)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, v_total=v_total, tile=tile),
        grid=(n_rt, n_tiles),  # vocab axis innermost: accumulate per row tile
        in_specs=[
            pl.BlockSpec((rt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lat_p.shape[0], 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(lat_p, vocab_p, vnorm_p)
    return out[:b]


def _call_bwd(latents, vocab, vnorm, g, tile):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v_total = vocab.shape[0]
    vocab_p = _pad_dim(vocab, tile, 0)
    vnorm_p = _pad_dim(vnorm[None, :], tile, 1)
    n_tiles = vocab_p.shape[0] // tile
    d = vocab_p.shape[1]
    b = latents.shape[0]
    lat_p, rt, n_rt = _row_tiling(latents)
    g_p = _pad_dim(g, rt, 0)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, v_total=v_total, tile=tile),
        grid=(n_rt, n_tiles),
        in_specs=[
            pl.BlockSpec((rt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lat_p.shape[0], d), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(lat_p, vocab_p, vnorm_p, g_p)
    return out[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def angular_partition_pallas(latents, vocab_embeddings, tile=_DEFAULT_TILE):
    """Fused-kernel drop-in for :func:`mmtpu.ops.wordprob.angular_partition`.

    Args:
        latents: ``(B, D)``.
        vocab_embeddings: ``(V, D)`` — treated as a constant (no cotangent).
        tile: vocab tile size (multiple of 8; default 512).

    Returns:
        ``(B, 1)`` partition values.

    Note: a custom row-flattening vmap rule (merge the sweep's K config
    calls into one ``(K·B, D)`` kernel so the vocabulary streams from HBM
    once instead of K times) was tried and MEASURED SLOWER on a v5e
    (7.24 s vs 6.20 s per 32-config chunk): the per-step reshape/relayout
    of the batched latents costs more than the saved vocabulary traffic.
    pallas_call's default grid batching is kept; the 2-D (rows × vocab)
    grid bounds VMEM for large-B calls either way.
    """
    vnorm = jnp.linalg.norm(vocab_embeddings, axis=-1)
    return _call_fwd(latents, vocab_embeddings, vnorm, tile)


def _vjp_fwd(latents, vocab_embeddings, tile):
    vnorm = jnp.linalg.norm(vocab_embeddings, axis=-1)
    z = _call_fwd(latents, vocab_embeddings, vnorm, tile)
    return z, (latents, vocab_embeddings, vnorm)


def _vjp_bwd(tile, residuals, g):
    latents, vocab, vnorm = residuals
    dlat = _call_bwd(latents, vocab, vnorm, g, tile)
    return dlat, None


angular_partition_pallas.defvjp(_vjp_fwd, _vjp_bwd)

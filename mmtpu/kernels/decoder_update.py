"""Fused decoder-update Pallas kernel: bwd-GEMM + optimizer in one HBM pass.

The per-step dense decoder update is the reference's semantics
(``simplesif.py:134-138`` — every step calls ``optimizer.step()`` over the
decoder's Linear weights) and the measured bandwidth floor of an Adam sweep
chunk (docs/DESIGN.md "Quantified floor": decoder-attributed fusions move
1.48 TB/chunk at ~453 GB/s ≈ 55% of a v5e's HBM peak).  XLA already fuses
the weight-grad GEMM into the Adam elementwise update, so the BYTES are
within ~6% of the floor — what's left on the table is achieved BANDWIDTH:
the per-head weight leaves are skinny (lane dim 80/53/133/... padded to
128-multiples → up to 25% dead lanes) and the 12 leaves update as ~36 small
back-to-back fusions that pipeline poorly.

This kernel runs the whole update as ONE pass over a stacked ``(D, ΣF_h)``
weight table per (mu / log_sigma) leaf:

    g_w   = xᵀ @ g_z                     (in-register, per F-tile, MXU)
    m,v,w = adam(w, m, v, g_w)           (same VMEM tile, one HBM r/w each)
    g_x  += g_z @ wᵀ                     (latent cotangent, sharing the SAME
                                          w read the update already paid for)

so per step the weight set streams HBM exactly once for {backward-dx,
backward-dw, optimizer} combined, with a contiguous layout (padding only at
the stacked table's end).  The latent/bias/norm gradients and their updates
stay in XLA (tiny).  Numerics: identical update law to
``mmtpu.train.optim.opt_update`` (torch Adam: betas (0.9, 0.999), eps 1e-8
added after the sqrt, bias correction by global step; SGD: ``w -= lr·g``),
with matmuls accumulated in float32.

``flag`` gates the update (``active ∧ train_dec`` — inactive epochs and
frozen-decoder configs keep w/m/v bit-identical) while ``g_x`` is ALWAYS
computed: a frozen decoder still back-propagates to the latents
(``simplesif.py:55-61`` — frozen decoders never enter the optimizer, but the
latents' gradient flows through their forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_B1 = 0.9
_B2 = 0.999
_EPS = 1e-8  # torch Adam default, added after the sqrt (optim.py)
_F_TILE = 512


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def _pad_last(a, multiple):
    pad = (-a.shape[-1]) % multiple
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[-1] = (0, pad)
    return jnp.pad(a, widths)


def _adam_kernel(s_ref, x_ref, gz_ref, w_ref, m_ref, v_ref,
                 w2_ref, m2_ref, v2_ref, gx_ref):
    """One F-tile: g_x accumulation + fused weight-grad GEMM + Adam."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        gx_ref[:, :] = jnp.zeros_like(gx_ref)

    x = x_ref[:, :]        # (B, D)
    gz = gz_ref[:, :]      # (B, Ft)
    w = w_ref[:, :]        # (D, Ft)
    lr = s_ref[0, 0]
    bc1 = s_ref[0, 1]
    bc2 = s_ref[0, 2]
    flag = s_ref[0, 3] > 0.0

    # latent cotangent from the PRE-update weights (chain rule uses the
    # forward's w); shares this tile's single HBM read of w
    gx_ref[:, :] += jax.lax.dot_general(
        gz, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, D)

    g = jax.lax.dot_general(
        x, gz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, Ft)
    m = m_ref[:, :]
    v = v_ref[:, :]
    m2 = _B1 * m + (1.0 - _B1) * g
    v2 = _B2 * v + (1.0 - _B2) * (g * g)
    w2 = w - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + _EPS)
    w2_ref[:, :] = jnp.where(flag, w2, w)
    m2_ref[:, :] = jnp.where(flag, m2, m)
    v2_ref[:, :] = jnp.where(flag, v2, v)


def _sgd_kernel(s_ref, x_ref, gz_ref, w_ref, w2_ref, gx_ref):
    import jax.experimental.pallas as pl

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        gx_ref[:, :] = jnp.zeros_like(gx_ref)

    x = x_ref[:, :]
    gz = gz_ref[:, :]
    w = w_ref[:, :]
    lr = s_ref[0, 0]
    flag = s_ref[0, 3] > 0.0

    gx_ref[:, :] += jax.lax.dot_general(
        gz, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = jax.lax.dot_general(
        x, gz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w2_ref[:, :] = jnp.where(flag, w - lr * g, w)


def fused_gemm_adam_update(w, m, v, x, g_z, lr, bc1, bc2, flag,
                           tile: int = _F_TILE):
    """Fused ``g_w = xᵀ@g_z`` + torch-Adam update + ``g_x = g_z@wᵀ``.

    Args:
        w, m, v: ``(D, F)`` weight table and Adam moments.  F should already
            be padded to a multiple of ``tile`` (see
            ``mmtpu.models.decoder.stack_decoder(pad_to=...)``) — zero-pad
            columns stay exactly zero under Adam (g=0 → m=v=0 → step 0/eps).
        x: ``(B, D)`` the (normed) latent batch of the forward pass.
        g_z: ``(B, F)`` cotangent of the head pre-activations.
        lr, bc1, bc2: learning rate and Adam bias corrections
            ``1-β₁^count``, ``1-β₂^count`` at the POST-increment step count
            (matching ``opt_update``).
        flag: 0/1 — applies the update when 1, passes w/m/v through when 0;
            ``g_x`` is computed either way.

    Returns:
        ``(w2, m2, v2, g_x)`` with ``g_x: (B, D)`` float32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, f = w.shape
    b = x.shape[0]
    w, m, v, g_z = (_pad_last(a, tile) for a in (w, m, v, g_z))
    fp = w.shape[1]
    n_tiles = fp // tile
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(bc1, jnp.float32),
        jnp.asarray(bc2, jnp.float32),
        jnp.asarray(flag, jnp.float32),
    ])[None, :]  # (1, 4)
    w2, m2, v2, gx = pl.pallas_call(
        _adam_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, fp), jnp.float32),
            jax.ShapeDtypeStruct((d, fp), jnp.float32),
            jax.ShapeDtypeStruct((d, fp), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(scalars, x, g_z, w, m, v)
    return w2[:, :f], m2[:, :f], v2[:, :f], gx


def fused_gemm_sgd_update(w, x, g_z, lr, flag, tile: int = _F_TILE):
    """SGD variant of :func:`fused_gemm_adam_update`: returns ``(w2, g_x)``."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, f = w.shape
    b = x.shape[0]
    w, g_z = _pad_last(w, tile), _pad_last(g_z, tile)
    fp = w.shape[1]
    n_tiles = fp // tile
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.asarray(flag, jnp.float32),
    ])[None, :]
    w2, gx = pl.pallas_call(
        _sgd_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, fp), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(scalars, x, g_z, w)
    return w2[:, :f], gx


def xla_reference_adam(w, m, v, x, g_z, lr, bc1, bc2, flag):
    """Plain-XLA reference of the fused Adam call (tests + fallback)."""
    g = x.T @ g_z
    m2 = _B1 * m + (1.0 - _B1) * g
    v2 = _B2 * v + (1.0 - _B2) * (g * g)
    w2 = w - jnp.asarray(lr) * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + _EPS)
    keep = jnp.asarray(flag, jnp.float32) > 0.0
    gx = g_z @ w.T
    return (jnp.where(keep, w2, w), jnp.where(keep, m2, m),
            jnp.where(keep, v2, v), gx)


def xla_reference_sgd(w, x, g_z, lr, flag):
    g = x.T @ g_z
    keep = jnp.asarray(flag, jnp.float32) > 0.0
    return jnp.where(keep, w - jnp.asarray(lr) * g, w), g_z @ w.T

"""Branchless SGD/Adam optimizer over parameter pytrees.

The reference selects ``torch.optim.SGD`` or ``torch.optim.Adam`` at
construction (``simplesif.py:58-61``).  Here the optimizer *kind* is a runtime
code so configs with different optimizers share one compiled program under
``vmap`` (the in-process sweep); both update rules are computed and selected —
the Adam bookkeeping is O(params) elementwise work, negligible next to the
O(B·V·D) word-likelihood matmul.

Update rules match torch defaults exactly:
- SGD: ``p -= lr * g`` (no momentum — reference passes only ``lr``).
- Adam: ``betas=(0.9, 0.999), eps=1e-8``, bias-corrected first/second moments,
  eps added *after* the sqrt (torch semantics).

One deliberate parity subtlety: torch's Adam applies a "stale momentum"
update to every parameter each step even when its gradient is zero (e.g.
embedding rows outside the current minibatch).  Because mmtpu computes a
dense gradient over the whole embedding table (zeros off-batch) and applies
the update to the full array, that behavior is reproduced exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

OPT_SGD = 0
OPT_ADAM = 1
OPT_CODES = {"sgd": OPT_SGD, "adam": OPT_ADAM}

_B1 = 0.9
_B2 = 0.999
_EPS = 1e-8


class OptState(NamedTuple):
    m: object  # first-moment pytree (same structure as params)
    v: object  # second-moment pytree
    count: jax.Array  # scalar int32 step counter


def init_opt_state(params, kind: str | None = None) -> OptState:
    """``kind`` None → branchless (moments allocated for the runtime select);
    "adam" → moments allocated; "sgd" → NO moment buffers (saves the dominant
    optimizer-state HBM traffic for SGD configs)."""
    if kind == "sgd":
        return OptState(m=None, v=None, count=jnp.zeros((), jnp.int32))
    zeros = lambda p: jnp.zeros_like(p)
    return OptState(
        m=jax.tree.map(zeros, params),
        v=jax.tree.map(zeros, params),
        count=jnp.zeros((), jnp.int32),
    )


def opt_update(
    params, grads, state: OptState, lr, opt_code, active=True,
    kind: str | None = None, gates=None,
):
    """One optimizer step.  Returns ``(new_params, new_state)``.

    Args:
        params / grads: matching pytrees.
        state: :class:`OptState`.
        lr: scalar learning rate (may be a traced per-config value).
        opt_code: ``OPT_SGD`` or ``OPT_ADAM`` (may be traced; ignored when
            ``kind`` is given).
        active: scalar bool — when False the step is a no-op (used for
            per-config "done" masking in the vmapped sweep, where every config
            runs the max epoch count but late epochs must not change state).
        kind: optional STATIC optimizer kind ("sgd" | "adam").  When set, the
            update rule is baked at trace time — SGD skips moment bookkeeping
            entirely, Adam skips the select — producing identical numbers to
            the branchless path with the matching opt_code.
        gates: optional pytree matching ``params`` of 0/1 scalars — a leaf
            whose gate is 0 is fully frozen: no parameter update AND no moment
            update, exactly torch's semantics for a ``requires_grad=False``
            parameter (its ``.grad`` stays None so Adam state never advances).
            Used for per-config ``freeze_weights`` in the vmapped sweep
            (reference ``simplesif.py:55-56``, ``models.py:170-178``).
    """
    count = state.count + 1
    lr = jnp.asarray(lr)
    act = jnp.asarray(active)
    if gates is not None:
        gmap = jax.tree.map(lambda g: jnp.logical_and(act, jnp.asarray(g) > 0), gates)

    if kind == "sgd":
        if gates is None:
            new_params = jax.tree.map(
                lambda p, g: jnp.where(act, p - lr * g, p), params, grads
            )
        else:
            new_params = jax.tree.map(
                lambda p, g, a: jnp.where(a, p - lr * g, p), params, grads, gmap
            )
        return new_params, OptState(
            m=None, v=None, count=jnp.where(act, count, state.count)
        )

    bc1 = 1.0 - jnp.power(_B1, count.astype(jnp.float32))
    bc2 = 1.0 - jnp.power(_B2, count.astype(jnp.float32))
    code = None if kind == "adam" else jnp.asarray(opt_code)

    def leaf(p, g, m, v, a):
        m2 = _B1 * m + (1.0 - _B1) * g
        v2 = _B2 * v + (1.0 - _B2) * jnp.square(g)
        adam_step = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + _EPS)
        if code is None:
            step = adam_step
        else:
            step = jnp.where(code == OPT_ADAM, adam_step, lr * g)
        p2 = p - step
        return (
            jnp.where(a, p2, p),
            jnp.where(a, m2, m),
            jnp.where(a, v2, v),
        )

    if gates is None:
        out = jax.tree.map(
            lambda p, g, m, v: leaf(p, g, m, v, act), params, grads, state.m, state.v
        )
    else:
        out = jax.tree.map(leaf, params, grads, state.m, state.v, gmap)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_m = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    new_v = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
    new_count = jnp.where(act, count, state.count)
    return new_params, OptState(m=new_m, v=new_v, count=new_count)


# ---------------------------------------------------------------------------
# Epoch-level lazy Adam (sweep fast path)
#
# In the permuted-epoch layout every latent row is touched by exactly one
# minibatch per epoch (row r → step r // batch_size), yet torch-Adam
# semantics update EVERY row EVERY step (zero-gradient rows take a pure
# "stale momentum" decay step — optim.opt_update docstring).  The dense
# formulation therefore sweeps the full (N, D) table (plus both moment
# tables) S times per epoch; an op-profile attributed ~27% of an Adam sweep
# chunk to the resulting per-step full-table traffic/copies.
#
# Lazy Adam computes the same real-arithmetic values with O(1) full-table
# passes per epoch:
#   - catch-up (per step, on the B-row slice only): the slice's pending
#     zero-grad steps 1..s collapse into one masked sum — with m_j = β1^j·m0
#     and v_j = β2^j·v0, step j's parameter delta is
#     lr·(β1^j·m0/bc1_j)/(√(β2^j·v0/bc2_j)+ε), a closed form in (m0, v0);
#   - touch (per step, slice only): the ordinary Adam update at global step
#     count0+s+1;
#   - epilogue (ONCE per epoch, full table): each block's remaining
#     S−1−s zero-grad steps, the same masked-sum form, exploiting that the
#     block index IS the touch step.
#
# Numerics: identical up to float rounding (β^k via pow vs k sequential
# multiplies; one accumulated subtraction vs S separate ones).  Measured
# max-rel drift vs the dense path is reported in tests/test_train_parity.py;
# the exact dense path remains the default (LatentFitSpec.lazy_adam=False)
# and the parity mode always uses it.
# ---------------------------------------------------------------------------


def lazy_adam_coeffs(count0, n_steps: int, lr):
    """Per-epoch coefficient vectors for the lazy-Adam closed forms.

    Returns ``(A1, A2, bc1, bc2)``, each ``(n_steps,)`` (entry j-1 ↔ epoch
    step j, global step count0+j): ``A1[j-1] = lr·β1^j / bc1``,
    ``A2[j-1] = β2^j / bc2`` — the zero-grad step-j parameter delta is
    ``A1·m0 / (√(A2·v0)+ε)``."""
    j = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    t = count0.astype(jnp.float32) + j
    bc1 = 1.0 - jnp.power(_B1, t)
    bc2 = 1.0 - jnp.power(_B2, t)
    b1p = jnp.power(_B1, j)
    b2p = jnp.power(_B2, j)
    return jnp.asarray(lr) * b1p / bc1, b2p / bc2, bc1, bc2


def lazy_adam_catch_up(p0, m0, v0, s, coeffs):
    """State of a B-row slice after its pending ``s`` zero-grad epoch steps
    (traced ``s``; masked sum over the static step axis)."""
    A1, A2, _, _ = coeffs
    S = A1.shape[0]
    mask = (jnp.arange(S) < s).astype(p0.dtype)  # steps j = 1..s
    num = (mask * A1)[:, None, None] * m0[None]
    den = jnp.sqrt(A2[:, None, None] * v0[None]) + _EPS
    p_s = p0 - jnp.sum(num / den, axis=0)
    sf = s.astype(p0.dtype)
    return p_s, jnp.power(_B1, sf) * m0, jnp.power(_B2, sf) * v0


def lazy_adam_touch(p_s, m_s, v_s, g, s, lr, coeffs):
    """The slice's real Adam update at epoch step index ``s`` (0-based;
    global step count0+s+1) — same elementwise form as opt_update."""
    _, _, bc1, bc2 = coeffs
    m2 = _B1 * m_s + (1.0 - _B1) * g
    v2 = _B2 * v_s + (1.0 - _B2) * jnp.square(g)
    p2 = p_s - jnp.asarray(lr) * (m2 / bc1[s]) / (jnp.sqrt(v2 / bc2[s]) + _EPS)
    return p2, m2, v2


def lazy_adam_epilogue(p, m, v, n_steps: int, bsz: int, lr, coeffs):
    """Apply every block's remaining ``S−1−s`` zero-grad steps in ONE pass.

    ``p, m, v`` are the permuted ``(S·B, D)`` tables right after the step
    scan: block s (rows [s·B, (s+1)·B)) holds its just-touched state.  The
    coefficient matrices are (K, S) with K = S−1 decay offsets; XLA fuses
    the K-term sum into the elementwise pass (nothing K-sized materializes
    at table scale)."""
    S, B = n_steps, bsz
    if S <= 1:
        return p, m, v
    _, _, bc1, bc2 = coeffs
    lr = jnp.asarray(lr)
    k = jnp.arange(1, S)                       # (K,) decay offset
    s = jnp.arange(S)                          # (S,) block index
    idx = s[None, :] + k[:, None]              # global step j−1 = s+k
    ok = idx <= S - 1
    idxc = jnp.clip(idx, 0, S - 1)
    b1k = jnp.power(_B1, k.astype(jnp.float32))
    b2k = jnp.power(_B2, k.astype(jnp.float32))
    C1 = jnp.where(ok, lr * b1k[:, None] / bc1[idxc], 0.0)   # (K, S)
    C2 = jnp.where(ok, b2k[:, None] / bc2[idxc], 1.0)
    D = p.shape[-1]
    mb = m.reshape(S, B, D)
    vb = v.reshape(S, B, D)
    delta = jnp.sum(
        C1[:, :, None, None] * mb[None]
        / (jnp.sqrt(C2[:, :, None, None] * vb[None]) + _EPS),
        axis=0,
    )                                          # (S, B, D)
    p2 = p - delta.reshape(S * B, D)
    rem = jnp.power(_B1, (S - 1 - s).astype(jnp.float32))    # β1^{S−1−s}
    rem2 = jnp.power(_B2, (S - 1 - s).astype(jnp.float32))
    m2 = (rem[:, None, None] * mb).reshape(S * B, D)
    v2 = (rem2[:, None, None] * vb).reshape(S * B, D)
    return p2, m2, v2

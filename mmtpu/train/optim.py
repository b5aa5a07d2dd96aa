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


"""Numeric failure detection.

The reference's failure handling is ``print`` + ``sys.exit()`` on infinite
losses (``losses.py:258-264``, ``simplesif.py:515-537``) — it kills the whole
process mid-sweep.  mmtpu raises a typed exception the caller can catch
(e.g. to drop one diverged config from a sweep instead of losing the run),
and offers a jit-safe in-graph checker via ``jax.debug`` callbacks.
"""

from __future__ import annotations

import numpy as np


class FiniteError(RuntimeError):
    """Raised when a tensor that must be finite contains inf/NaN."""


def check_finite(tree, where: str = "") -> None:
    """Host-side finiteness check over a pytree of arrays (post-fit guard)."""
    import jax

    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        prefix = f"{where}: " if where else ""
        raise FiniteError(prefix + "; ".join(bad))


def debug_assert_finite(x, name: str = "tensor"):
    """In-graph guard usable under jit: prints from the device when non-finite
    values appear (does not abort — XLA programs cannot early-exit; pair with
    :func:`check_finite` on outputs for hard failure)."""
    import jax
    import jax.numpy as jnp

    ok = jnp.isfinite(x).all()
    jax.debug.callback(
        lambda ok_: None if ok_ else print(f"[mmtpu] WARNING: {name} non-finite"),
        ok,
    )
    return x

"""Parameter initializers with torch-`nn.Linear` distributional parity.

torch's default Linear init draws both weight and bias i.i.d. uniform on
``(-1/sqrt(fan_in), 1/sqrt(fan_in))`` (kaiming_uniform with a=sqrt(5) reduces
to exactly that bound).  The reference never seeds torch, so parity is
distributional, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_init(
    key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32
) -> dict:
    """Weight ``(in_dim, out_dim)`` + bias ``(out_dim,)``, torch-Linear law.

    Note mmtpu stores weights in (in, out) layout so forward is ``x @ w + b``
    (torch stores (out, in); the init law is i.i.d. so layout is irrelevant).
    """
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype))
    w = jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}

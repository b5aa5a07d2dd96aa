"""Persistent XLA compilation cache.

Remote TPU compilation in this environment costs minutes for the big scan
programs; the persistent cache makes every re-run (CLI invocations, bench
rounds, resumed sweeps) skip compilation entirely.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("MMTPU_CACHE_DIR", "/tmp/mmtpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the knobs
        pass

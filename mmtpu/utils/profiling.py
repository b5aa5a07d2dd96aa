"""Profiling / tracing.

The reference's only instrumentation is wall-clock deltas in training logs
(``simplesif.py:64,144``) and the ``--time_test`` timing
(``simplesif.py:873-880``).  mmtpu adds:

- :func:`trace` — a context manager around ``jax.profiler`` producing
  TensorBoard-compatible device traces;
- :class:`StepTimer` — steady-state step timing with warmup exclusion and
  forced materialization (on async/remote backends ``block_until_ready`` can
  return before execution completes; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmtpu_trace"):
    """Capture a jax.profiler device trace (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; reports steady-state statistics."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)
        return False

    def time_fn(self, fn, *args, iters: int = 5):
        """Run ``fn(*args)`` ``iters`` times (plus warmup), materializing the
        output each time; returns the result of the last call."""
        out = None
        for i in range(self.warmup + iters):
            t0 = time.time()
            out = fn(*args)
            import jax

            jax.tree.map(np.asarray, out)  # force full materialization
            dt = time.time() - t0
            if i >= self.warmup:
                self.times.append(dt)
        return out

    @property
    def steady(self) -> List[float]:
        return self.times[self.warmup:] if self._t0 is not None else self.times

    def summary(self) -> dict:
        arr = np.asarray(self.steady or self.times)
        if arr.size == 0:
            return {}
        return {
            "mean_s": float(arr.mean()),
            "median_s": float(np.median(arr)),
            "min_s": float(arr.min()),
            "max_s": float(arr.max()),
            "n": int(arr.size),
        }

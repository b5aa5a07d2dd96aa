"""Checkpoint / resume for long runs and sweeps.

The reference has artifact saving but NO mid-run resume (SURVEY.md §5) — a
killed run restarts from scratch.  mmtpu adds atomic pytree checkpoints with
a step counter.  Two consumers:

- ``mmtpu.train.chunked.fit_latents_checkpointed`` saves the full fit carry
  (embeddings, decoder, optimizer moments, rng) at epoch-segment boundaries,
  so a killed FIT resumes at the last completed segment;
- ``mmtpu.sweep.run_sweep(checkpoint_dir=...)`` persists per-chunk results,
  so a killed SWEEP resumes at the first incomplete chunk (fingerprinted
  against the sweep's inputs).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import numpy as np


def _is_key(x) -> bool:
    import jax

    return (
        hasattr(x, "dtype")
        and jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key)
    )


def save_pytree(path: str, tree) -> None:
    """Atomically save an arbitrary pytree of arrays as .npz + structure json.
    Typed PRNG key arrays are serialized via ``jax.random.key_data`` (the fit
    carry checkpointed by ``mmtpu.train.chunked`` carries the scan rng)."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    leaves = [
        jax.random.key_data(l) if _is_key(l) else l for l in leaves
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    with open(path + ".tree", "w") as f:
        f.write(str(treedef))


def load_pytree(path: str, like):
    """Load arrays saved by :func:`save_pytree` into the structure of ``like``
    (leaves that are typed PRNG keys in ``like`` are re-wrapped)."""
    import jax

    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    out = []
    for i, ref in enumerate(leaves):
        raw = data[f"leaf{i}"]
        if _is_key(ref):
            impl = jax.random.key_impl(ref)
            raw = jax.random.wrap_key_data(raw, impl=impl)
        out.append(raw)
    return jax.tree.unflatten(treedef, out)


class Checkpointer:
    """Step-stamped checkpoint directory with resume support."""

    def __init__(self, directory: str, keep: int = 2):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "manifest.json")

    def save(self, step: int, tree, extra: Optional[dict] = None) -> str:
        path = os.path.join(self.directory, f"ckpt_{step}.npz")
        save_pytree(path, tree)
        manifest = {"latest_step": step, "extra": extra or {}}
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())
        self._gc(step)
        return path

    def _gc(self, current_step: int) -> None:
        steps = sorted(self.steps())
        for s in steps[: max(0, len(steps) - self.keep)]:
            for suffix in (".npz", ".npz.tree"):
                p = os.path.join(self.directory, f"ckpt_{s}{suffix}")
                if os.path.exists(p):
                    os.unlink(p)

    def steps(self):
        out = []
        for fn in os.listdir(self.directory):
            if fn.startswith("ckpt_") and fn.endswith(".npz"):
                out.append(int(fn[len("ckpt_"):-len(".npz")]))
        return out

    def latest_step(self) -> Optional[int]:
        if not os.path.exists(self._manifest_path()):
            return None
        return json.load(open(self._manifest_path()))["latest_step"]

    def restore(self, like, step: Optional[int] = None):
        """Returns ``(tree, step, extra)`` or ``(None, None, None)``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None, None
        path = os.path.join(self.directory, f"ckpt_{step}.npz")
        manifest = json.load(open(self._manifest_path()))
        return load_pytree(path, like), step, manifest.get("extra", {})

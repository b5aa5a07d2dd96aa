"""Checkpoint / resume for long runs and sweeps.

The reference has artifact saving but NO mid-run resume (SURVEY.md §5) — a
killed run restarts from scratch.  mmtpu adds atomic pytree checkpoints with
a step counter, so a sweep interrupted at epoch k resumes at epoch k.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import numpy as np


def save_pytree(path: str, tree) -> None:
    """Atomically save an arbitrary pytree of arrays as .npz + structure json."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
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
    """Load arrays saved by :func:`save_pytree` into the structure of ``like``."""
    import jax

    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(
        treedef, [data[f"leaf{i}"] for i in range(len(leaves))]
    )


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

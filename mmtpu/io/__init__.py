"""Artifact store and checkpoint/resume."""

from mmtpu.io.artifacts import ArtifactStore
from mmtpu.io.checkpoint import save_pytree, load_pytree, Checkpointer

__all__ = ["ArtifactStore", "save_pytree", "load_pytree", "Checkpointer"]

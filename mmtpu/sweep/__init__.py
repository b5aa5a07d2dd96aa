"""In-process hyperparameter sweep: vmapped over configs, sharded over chips.

Replaces the reference's sweep "orchestration" — the user invoking
``simplesif.py`` once per config JSON, 512 times (SURVEY.md §3.5) — with ONE
compiled program that trains every config simultaneously as a leading vmap
axis, sharded across the device mesh.
"""

from mmtpu.sweep.pack import SweepStatics, pack_configs, statics_from_configs
from mmtpu.sweep.runner import run_sweep, SweepResult

__all__ = [
    "SweepStatics",
    "pack_configs",
    "statics_from_configs",
    "run_sweep",
    "SweepResult",
]

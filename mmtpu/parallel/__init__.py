"""Mesh + sharding utilities (new capability vs the single-device reference).

The reference has no parallelism of any kind (SURVEY.md §2 row 23).  mmtpu's
natural parallel axes (SURVEY.md §5):
- "config": the hyperparameter-sweep axis — pure data parallel, no
  cross-config communication; shards the vmapped sweep across chips over ICI.
- "data":   batch axis — gradient psum if one config outgrows a chip.
- vocab sharding for the word-likelihood partition term is available via
  ``mmtpu.parallel.collectives.sharded_angular_partition``.
"""

from mmtpu.parallel.mesh import make_mesh, config_sharding, replicated
from mmtpu.parallel.collectives import (
    sharded_angular_partition,
    sharded_gaussian_logpdf,
)

__all__ = [
    "make_mesh",
    "config_sharding",
    "replicated",
    "sharded_angular_partition",
    "sharded_gaussian_logpdf",
]

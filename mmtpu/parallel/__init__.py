"""Mesh + sharding utilities (new capability vs the single-device reference).

The reference has no parallelism of any kind (SURVEY.md §2 row 23).  mmtpu's
natural parallel axes (SURVEY.md §5):
- "config": the hyperparameter-sweep axis — pure data parallel, no
  cross-config communication; shards the vmapped sweep across chips over ICI.
- "data":   batch axis — per-step rows split across devices with gradient
  psum, integrated into the training engine via
  ``mmtpu.parallel.fit.fit_latents_mesh``.
- "vocab":  the word-likelihood partition term's vocabulary axis — standalone
  op ``sharded_angular_partition`` or integrated via ``fit_latents_mesh``.
"""

from mmtpu.parallel.mesh import make_mesh, config_sharding, replicated
from mmtpu.parallel.collectives import (
    sharded_angular_partition,
    sharded_gaussian_logpdf,
)
from mmtpu.parallel.fit import (
    fit_e2e_mesh,
    fit_latents_mesh,
    make_fit_mesh,
    place_fit_inputs,
)
from mmtpu.parallel.multihost import (
    init_multihost,
    run_sweep_multihost,
    shard_configs,
)

__all__ = [
    "make_mesh",
    "config_sharding",
    "replicated",
    "sharded_angular_partition",
    "sharded_gaussian_logpdf",
    "fit_e2e_mesh",
    "fit_latents_mesh",
    "make_fit_mesh",
    "place_fit_inputs",
    "init_multihost",
    "run_sweep_multihost",
    "shard_configs",
]

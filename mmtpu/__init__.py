"""mmtpu — TPU-native JAX framework for MMB1/MMB2 multimodal utterance embeddings.

A from-scratch, TPU-first re-design of the capabilities of
yaochie/multimodal-baselines ("Strong and Simple Baselines for Multimodal
Utterance Embeddings", NAACL 2019):

- SIF sentence-embedding initialization (frequency-weighted word averaging +
  first-principal-component removal) as batched XLA ops (`mmtpu.ops.sif`).
- MMB1/MMB2 generative decoders (diagonal-Gaussian heads over modality
  subsets) as parameter pytrees (`mmtpu.models.decoder`).
- Arora-style word likelihood (angular / dot-product mixture) with an optional
  fused Pallas TPU kernel (`mmtpu.ops.wordprob`, `mmtpu.kernels.angular`).
- Latent optimization, end-to-end training, and downstream sentiment
  evaluation as single jitted `lax.scan` programs (`mmtpu.train`).
- The hyperparameter grid runs as ONE vmapped, mesh-sharded program instead of
  512 serial CLI invocations (`mmtpu.sweep`).

Reference behavior citations in docstrings point into the upstream repo as
`<file>:<line>` (e.g. ``simplesif.py:49-162``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    if name == "run_experiment":
        from mmtpu.runner import run_experiment

        return run_experiment
    if name == "run_sweep":
        from mmtpu.sweep import run_sweep

        return run_sweep
    if name == "ExperimentConfig":
        from mmtpu.config import ExperimentConfig

        return ExperimentConfig
    if name == "load_dataset":
        from mmtpu.data import load_dataset

        return load_dataset
    raise AttributeError(name)

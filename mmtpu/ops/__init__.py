"""Pure jittable math ops (the "kernel" layer of mmtpu).

Every function here is a pure function of arrays, safe under `jax.jit`,
`jax.vmap`, and `jax.grad`, with static shapes only.
"""

from mmtpu.ops.sif import (
    seq_weights,
    sif_weighted_average,
    first_pc,
    remove_pc,
    sif_embedding,
)
from mmtpu.ops.gaussian import gaussian_logpdf_masked
from mmtpu.ops.wordprob import (
    word_logprob_angular,
    word_logprob_dot_prod,
    angular_partition,
)
from mmtpu.ops.posenc import positional_encoding, add_positional_embeddings
from mmtpu.ops.joint import joint_log_prob
from mmtpu.ops.closed_form import closed_form_latents, gaussian_inverse_weights

__all__ = [
    "seq_weights",
    "sif_weighted_average",
    "first_pc",
    "remove_pc",
    "sif_embedding",
    "gaussian_logpdf_masked",
    "word_logprob_angular",
    "word_logprob_dot_prod",
    "angular_partition",
    "positional_encoding",
    "add_positional_embeddings",
    "joint_log_prob",
    "closed_form_latents",
    "gaussian_inverse_weights",
]

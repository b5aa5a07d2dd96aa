"""Jitted training programs: latent optimization, e2e, sentiment fitting."""

from mmtpu.train.optim import (
    OPT_SGD,
    OPT_ADAM,
    OPT_CODES,
    init_opt_state,
    opt_update,
)
from mmtpu.train.latents import fit_latents, LatentFitSpec
from mmtpu.train.sentiment import fit_sentiment, SentimentFitSpec

__all__ = [
    "OPT_SGD",
    "OPT_ADAM",
    "OPT_CODES",
    "init_opt_state",
    "opt_update",
    "fit_latents",
    "LatentFitSpec",
    "fit_sentiment",
    "SentimentFitSpec",
]

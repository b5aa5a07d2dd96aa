"""Model parameter pytrees and functional forward passes."""

from mmtpu.models.init import torch_linear_init
from mmtpu.models.decoder import (
    MMB1_HEADS,
    MMB2_HEADS,
    head_segments,
    head_dims,
    init_decoder,
    apply_decoder,
    apply_norm,
    NORM_NONE,
    NORM_LAYER,
    NORM_BATCH,
)
from mmtpu.models.sentiment import init_sentiment, apply_sentiment

__all__ = [
    "torch_linear_init",
    "MMB1_HEADS",
    "MMB2_HEADS",
    "head_segments",
    "head_dims",
    "init_decoder",
    "apply_decoder",
    "apply_norm",
    "NORM_NONE",
    "NORM_LAYER",
    "NORM_BATCH",
    "init_sentiment",
    "apply_sentiment",
]

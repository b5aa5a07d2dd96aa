"""Data layer: dataset registry, HDF5/npy ingestion, normalization, synthesis."""

from mmtpu.data.normalize import normalize_split, text_token_mask, aligned_text_mask
from mmtpu.data.synthetic import synthesize_dataset
from mmtpu.data.registry import load_dataset, DATASETS
from mmtpu.data.pipeline import prepare_device_data, PreparedData

__all__ = [
    "normalize_split",
    "text_token_mask",
    "aligned_text_mask",
    "synthesize_dataset",
    "load_dataset",
    "DATASETS",
    "prepare_device_data",
    "PreparedData",
]

"""Evaluation metrics (device-side, jit/vmap-safe) and host-side reports."""

from mmtpu.eval.metrics import (
    mae,
    pearson_corr,
    mult_acc,
    weighted_f1,
    binary_accuracy,
    mosi_metrics,
    pom_metrics,
    iemocap_metrics,
)
from mmtpu.eval.report import (
    confusion_matrix,
    classification_report_dict,
    full_loss,
    pom_loss,
    iemocap_loss,
)

__all__ = [
    "mae",
    "pearson_corr",
    "mult_acc",
    "weighted_f1",
    "binary_accuracy",
    "mosi_metrics",
    "pom_metrics",
    "iemocap_metrics",
    "confusion_matrix",
    "classification_report_dict",
    "full_loss",
    "pom_loss",
    "iemocap_loss",
]

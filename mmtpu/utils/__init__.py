"""Auxiliary subsystems: profiling, logging, numeric guards (SURVEY.md §5)."""

from mmtpu.utils.profiling import trace, StepTimer
from mmtpu.utils.logging import get_logger, MetricsLogger
from mmtpu.utils.guards import check_finite, FiniteError

__all__ = [
    "trace",
    "StepTimer",
    "get_logger",
    "MetricsLogger",
    "check_finite",
    "FiniteError",
]

"""Pallas TPU kernels for the hot ops."""

from mmtpu.kernels.angular import angular_partition_pallas, pallas_available

__all__ = ["angular_partition_pallas", "pallas_available"]

"""Pallas TPU kernels for the hot ops."""

from .afi_rdb import fused_rdb

__all__ = ["fused_rdb"]

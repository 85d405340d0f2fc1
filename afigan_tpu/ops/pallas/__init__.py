"""Pallas TPU kernels for the hot ops."""

from .afi_rdb import fused_rdb
from .afi_upsample import fused_upsample

__all__ = ["fused_rdb", "fused_upsample"]

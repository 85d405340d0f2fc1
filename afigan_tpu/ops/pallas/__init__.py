"""Pallas TPU kernels for the hot ops."""

from .afi_chain import fused_generator_chain
from .afi_rdb import fused_rdb
from .afi_upsample import fused_upsample
from .roi_pool import fused_window_pool
from .window_attention import fused_window_attention

__all__ = [
    "fused_generator_chain",
    "fused_rdb",
    "fused_upsample",
    "fused_window_pool",
    "fused_window_attention",
]

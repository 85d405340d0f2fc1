"""Feature-patch discriminator — PatchGAN over pyramid feature maps.

Architecture parity with the reference Discriminator
(ref: afigan/modeling/feat_interpol/feature_patch_discriminator.py:16-55):
3 conv blocks 256→512→1024→1024 (3x3, stride 1, BatchNorm + LeakyReLU 0.2)
followed by a 1-channel 3x3 conv producing a per-patch real/fake logit
map. Weight init: c2_msra_fill (ref :43-46). The reference scaffolds a
Discriminators ModuleList with a ``current_step`` selector but only ever
builds index 0 (ref :27-49); we keep one stack named ``discriminators_0``.

TPU notes: BatchNorm batch statistics sync across the data mesh axis via
``axis_name`` when run inside shard_map (the NCCL SyncBN equivalent,
SURVEY §7.4 hard-part 5).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..layers import Conv, c2_msra_fill, leaky_relu02

Dtype = Any


class PatchDiscriminator(nn.Module):
    in_channels: int = 256
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, H, W, 1) patch logits."""
        y = x.astype(self.dtype)
        widths = [self.in_channels * min(2**n, 4) for n in range(1, 4)]  # 512,1024,1024
        for i, w in enumerate(widths):
            y = Conv(
                w, kernel_size=3, stride=1, padding=1,
                # "SyncBN" so get_norm honors axis_name inside shard_map
                # (with axis_name=None it is exactly plain BN). The torch
                # reference runs plain BN under DDP broadcast_buffers=False
                # (per-rank unsynced stats — an artifact); syncing makes
                # the replicated out_specs state well-defined and the
                # multi-device step equal the full-batch step.
                norm="SyncBN", train=self.train, axis_name=self.axis_name,
                kernel_init=c2_msra_fill(), dtype=self.dtype,
                name=f"discriminators_0/block{i}",
            )(y)
            y = leaky_relu02(y)
        y = Conv(
            1, kernel_size=3, stride=1, padding=1,
            kernel_init=c2_msra_fill(), dtype=self.dtype,
            name="discriminators_0/out",
        )(y)
        return y

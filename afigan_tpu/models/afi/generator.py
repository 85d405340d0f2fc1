"""AF interpolator (generator) — the core novelty of AFI-GAN, TPU-native.

Architecture parity with the reference Generator
(ref: afigan/modeling/feat_interpol/generator_rdb.py:73-130):

    bilinear x2 skip
  + [ conv3x3+LReLU → ResidualInResidual(n_rdb x RDB) → conv3x3+LReLU
      → ConvTranspose(k=6, s=2, p=2)+LReLU → conv3x3 ]

RDB = 5 densely-connected 3x3 convs (growth 32, no bias, LReLU 0.2 on the
first four), residual scale 0.2 (ref :33-71). Weight init: kaiming normal
x0.1, zero bias (ref :57-62, :110-118). Defaults in_channels=256,
growth_rate=32, residual_scale=0.2 (ref :75); the framework builds it with
n_rdb=3 everywhere (ref fpn_sr.py:65, stage1_trainer.py:505).

The reference scaffolds a ModuleList of progressive generators but only
ever builds/uses index 0 (ref :87-121); we keep a single generator and
name its param subtree ``generators_0`` so checkpoint surgery
("Generators.0.*" ↔ "backbone.srf_module.Generators.0.*", ref
checkpoint.py:94) maps 1:1.

TPU notes: NHWC, compute dtype configurable (bf16 by default), ~17 convs
per call — run 3-28x per pyramid forward (SURVEY §3.5). All convs are
3x3/stride-1 so XLA lowers them to MXU matmuls over im2col tiles; the
Pallas fused variant (ops/pallas/afi_upsample.py) fuses the elementwise
chain when enabled.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import (
    Conv,
    ConvTranspose,
    bilinear_upsample_x2,
    kaiming_normal_scaled,
    leaky_relu02,
)

Dtype = Any


class ResidualDenseBlock(nn.Module):
    growth_rate: int = 32
    residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    fused: bool = False  # use the Pallas fused-chain kernel (inference)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = kaiming_normal_scaled(0.1)

        def dense_conv_module(out_feats, name):
            # input width (c + i*g, the dense concat) is inferred by flax
            return Conv(
                out_feats, kernel_size=3, padding=1, use_bias=False,
                kernel_init=init, dtype=self.dtype, name=name,
            )

        g = self.growth_rate
        convs = [
            dense_conv_module(g if i < 4 else c, f"conv{i+1}")
            for i in range(5)
        ]

        if self.fused and not self.is_initializing():
            # Pallas fused chain (ops/pallas/afi_rdb.py): identical math,
            # no HBM-materialized concatenations. Reads the SAME params the
            # unfused path creates (init always traces unfused).
            from ...ops.pallas import fused_rdb

            p = self.variables["params"]
            kernels = [p[f"conv{i+1}"]["conv"]["kernel"] for i in range(5)]
            return fused_rdb(
                x, kernels, self.residual_scale
            ).astype(self.dtype)

        return self._unfused(x, convs)

    def _unfused(self, x, convs):
        c1 = leaky_relu02(convs[0](x))
        c2 = leaky_relu02(convs[1](jnp.concatenate([x, c1], -1)))
        c3 = leaky_relu02(convs[2](jnp.concatenate([x, c1, c2], -1)))
        c4 = leaky_relu02(convs[3](jnp.concatenate([x, c1, c2, c3], -1)))
        c5 = convs[4](jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + c5 * self.residual_scale


class ResidualInResidual(nn.Module):
    n_rdb: int = 3
    growth_rate: int = 32
    residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    fused: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        block_cls = nn.remat(ResidualDenseBlock) if self.remat else ResidualDenseBlock
        y = x
        for i in range(self.n_rdb):
            y = block_cls(
                self.growth_rate, self.residual_scale, self.dtype,
                fused=self.fused, name=f"rdb{i}",
            )(y)
        return x + y * self.residual_scale


class AFIGenerator(nn.Module):
    """Learned 2x feature upsampler (the ``srf_module``)."""

    in_channels: int = 256
    n_rdb: int = 3
    growth_rate: int = 32
    residual_scale: float = 0.2
    dtype: Dtype = jnp.float32
    fused: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, 2H, 2W, C)"""
        init = kaiming_normal_scaled(0.1)

        if self.fused and not self.is_initializing() and self.n_rdb == 3:
            # Whole-generator two-kernel pipeline: ONE chain kernel
            # (head + 3 RDBs + RiR residual, ops/pallas/afi_chain.py)
            # + ONE conv-upsample kernel — 2 custom calls instead of the
            # round-2 four. Params are the ones the unfused path creates
            # (init always traces unfused).
            from ...ops.pallas import fused_generator_chain, fused_upsample

            p = self.variables["params"]
            rir = p["generators_0/rir"]
            rdb_ws = [
                [rir[f"rdb{i}"][f"conv{j + 1}"]["conv"]["kernel"]
                 for j in range(5)]
                for i in range(self.n_rdb)
            ]
            xd = x.astype(self.dtype)
            r = fused_generator_chain(
                xd,
                p["generators_0/head"]["conv"]["kernel"],
                p["generators_0/head"]["conv"]["bias"],
                rdb_ws, self.residual_scale,
            ).astype(self.dtype)
            return fused_upsample(
                r, xd,
                p["generators_0/mid"]["conv"]["kernel"],
                p["generators_0/mid"]["conv"]["bias"],
                p["generators_0/up"]["kernel"],
                p["generators_0/up"]["bias"],
                p["generators_0/tail"]["conv"]["kernel"],
                p["generators_0/tail"]["conv"]["bias"],
            ).astype(self.dtype)

        # Param subtree named to mirror the reference's Generators[0] stack.
        y = x.astype(self.dtype)
        y = leaky_relu02(
            Conv(self.in_channels, 3, padding=1, kernel_init=init,
                 dtype=self.dtype, name="generators_0/head")(y)
        )
        y = ResidualInResidual(
            self.n_rdb, self.growth_rate, self.residual_scale, self.dtype,
            fused=self.fused, remat=self.remat, name="generators_0/rir",
        )(y)
        if self.fused and not self.is_initializing():
            # Pallas fused conv-upsample (ops/pallas/afi_upsample.py):
            # mid → ConvTranspose phases → tail → +bilinear skip in one
            # VMEM-resident kernel. Reads the params the unfused path
            # creates (init always traces unfused).
            from ...ops.pallas import fused_upsample

            p = self.variables["params"]
            return fused_upsample(
                y, x.astype(self.dtype),
                p["generators_0/mid"]["conv"]["kernel"],
                p["generators_0/mid"]["conv"]["bias"],
                p["generators_0/up"]["kernel"],
                p["generators_0/up"]["bias"],
                p["generators_0/tail"]["conv"]["kernel"],
                p["generators_0/tail"]["conv"]["bias"],
            ).astype(self.dtype)
        y = leaky_relu02(
            Conv(self.in_channels, 3, padding=1, kernel_init=init,
                 dtype=self.dtype, name="generators_0/mid")(y)
        )
        y = leaky_relu02(
            ConvTranspose(self.in_channels, kernel_size=6, stride=2, padding=2,
                          kernel_init=init, dtype=self.dtype,
                          name="generators_0/up")(y)
        )
        y = Conv(self.in_channels, 3, padding=1, kernel_init=init,
                 dtype=self.dtype, name="generators_0/tail")(y)
        # bilinear skip (the fused branches compute theirs in-kernel)
        skip = bilinear_upsample_x2(x.astype(jnp.float32)).astype(self.dtype)
        return y + skip

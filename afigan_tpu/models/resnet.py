"""ResNet-50/101 backbone — d2-compatible structure, NHWC/Flax.

Structural parity with detectron2 v0.1.1 ``build_resnet_backbone`` (which
the reference uses as the bottom-up of every R-50/R-101 config, ref
fpn_sr.py:13,210): 7x7/stride-2 stem + 3x3/stride-2 maxpool, stages
res2..res5 of bottleneck blocks (1x1 → 3x3 → 1x1), FrozenBN by default,
``STRIDE_IN_1X1`` controlling whether the stride sits on the 1x1 or the
3x3 conv, optional dilation on res5.

Param tree naming (stem/conv1, res2/block0/conv1, shortcut, ...) is chosen
so the torch-checkpoint converter (utils/converters.py) maps d2/Caffe2
names with pure path rewrites.

Freezing (BACKBONE.FREEZE_AT) is not baked into the module — the train
step masks those param subtrees out of the optimizer (the functional
equivalent of requires_grad=False).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
import jax

from .layers import Conv, c2_msra_fill, get_norm

Dtype = Any

# depth -> blocks per stage
RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        common = dict(
            norm=self.norm, train=self.train, axis_name=self.axis_name,
            kernel_init=c2_msra_fill(), use_bias=False, dtype=self.dtype,
        )
        out = Conv(self.bottleneck_channels, 1, stride=stride_1x1,
                   padding=0, name="conv1", **common)(x)
        out = jax.nn.relu(out)
        out = Conv(self.bottleneck_channels, 3, stride=stride_3x3,
                   padding=self.dilation, dilation=self.dilation,
                   groups=self.num_groups, name="conv2", **common)(out)
        out = jax.nn.relu(out)
        out = Conv(self.out_channels, 1, stride=1, padding=0,
                   name="conv3", **common)(out)

        if in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv(self.out_channels, 1, stride=self.stride,
                            padding=0, name="shortcut", **common)(x)
        else:
            shortcut = x
        return jax.nn.relu(out + shortcut)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut — the R-18/34 block
    (d2 BasicBlock). Channels 64..512, no bottleneck."""

    out_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        common = dict(
            norm=self.norm, train=self.train, axis_name=self.axis_name,
            kernel_init=c2_msra_fill(), use_bias=False, dtype=self.dtype,
        )
        out = Conv(self.out_channels, 3, stride=self.stride, padding=1,
                   name="conv1", **common)(x)
        out = jax.nn.relu(out)
        out = Conv(self.out_channels, 3, stride=1, padding=1,
                   name="conv2", **common)(out)
        if in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv(self.out_channels, 1, stride=self.stride,
                            padding=0, name="shortcut", **common)(x)
        else:
            shortcut = x
        return jax.nn.relu(out + shortcut)


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "FrozenBN"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out_channels, 7, stride=2, padding=3, use_bias=False,
                 norm=self.norm, train=self.train, axis_name=self.axis_name,
                 kernel_init=c2_msra_fill(), dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(y)
        # 3x3 stride-2 maxpool, torch padding=1
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return y


class ResNet(nn.Module):
    """d2-compatible ResNet. Returns {"res2": ..., ..., "res5": ...} (NHWC)."""

    depth: int = 50
    norm: str = "FrozenBN"
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    remat: bool = False
    # None: remat every stage (TPU.REMAT_MODE "full"); else only the
    # named stages — "selective" remats res2, whose activations dominate
    # (stride-4 planes) while its recompute is a small backbone fraction.
    remat_stages: Optional[Sequence[str]] = None
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        stage_blocks = RESNET_STAGES[self.depth]
        basic = self.depth in (18, 34)  # BasicBlock depths (d2)
        if basic:
            assert self.res2_out_channels == 64, (
                "R-18/34 use BasicBlock with res2 channels 64 "
                "(set MODEL.RESNETS.RES2_OUT_CHANNELS 64)"
            )
            assert self.num_groups == 1, "R-18/34 have no grouped convs"
        y = BasicStem(self.stem_out_channels, self.norm, self.train,
                      self.axis_name, self.dtype, name="stem")(x.astype(self.dtype))

        out: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        max_stage = max(
            int(f[len("res"):]) for f in self.out_features if f.startswith("res")
        )
        for idx, stage in enumerate(range(2, 6)):
            if stage > max_stage:
                break
            name = f"res{stage}"
            stage_remat = self.remat and (
                self.remat_stages is None or name in self.remat_stages
            )
            base_cls = BasicBlock if basic else BottleneckBlock
            block_cls = nn.remat(base_cls) if stage_remat else base_cls
            first_stride = 1 if stage == 2 else 2
            dilation = self.res5_dilation if stage == 5 else 1
            if stage == 5 and self.res5_dilation == 2:
                first_stride = 1
            for b in range(stage_blocks[idx]):
                kwargs = dict(
                    out_channels=out_channels,
                    stride=first_stride if b == 0 else 1,
                    norm=self.norm,
                    train=self.train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"{name}/block{b}",
                )
                if not basic:
                    kwargs.update(
                        bottleneck_channels=bottleneck_channels,
                        num_groups=self.num_groups,
                        stride_in_1x1=self.stride_in_1x1,
                        dilation=dilation,
                    )
                y = block_cls(**kwargs)(y)
            if name in self.out_features:
                out[name] = y
            out_channels *= 2
            bottleneck_channels *= 2
        return out

def build_resnet(cfg, train: bool = False, axis_name: Optional[str] = None,
                 dtype=jnp.float32) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        remat=bool(train and cfg.TPU.REMAT),
        remat_stages=(
            # res2 only. Extending to res2+res3 was tried and AOT-measured
            # WORSE (15.2 vs 13.4 GiB temp at batch 16): XLA's scheduler
            # does not convert the extra recompute into lower peak here.
            ("res2",) if cfg.TPU.REMAT_MODE == "selective" else None
        ),
        depth=r.DEPTH,
        norm=r.NORM,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        out_features=tuple(r.OUT_FEATURES),
        train=train,
        axis_name=axis_name,
        dtype=dtype,
    )

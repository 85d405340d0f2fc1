"""ResNeSt backbone (split-attention ResNet) — NHWC/Flax.

Parity with the reference's ResNeSt
(ref: afigan/modeling/backbone/resnest.py:92-243, 415-591 and splat.py:20-101):
  * deep stem (3x 3x3 convs) when radix > 1 (builder rule resnest.py:494)
  * bottleneck with group_width = bottleneck_channels * width/64 * cardinality
  * SplAtConv2d: grouped conv to channels*radix → BN+ReLU → radix-sum →
    global pool → fc1(1x1, groups=cardinality)+BN+ReLU → fc2 → rSoftMax
    over radix → attention-weighted recombination (splat.py:55-85)
  * AVD: 3x3/stride avg-pool after conv2 (conv2 stride forced to 1)
  * AVG_DOWN: shortcut = avg-pool(stride) then 1x1/stride-1 conv
  * avd/avg_down/deep_stem implied by radix>1 (builder rules :494,523-524)

The reference's DeformBottleneckBlock (DCN) is not exercised by any of its
shipped configs (DEFORM_ON_PER_STAGE defaults False); deformable conv is
provided separately in ops/deform_conv.py and can be slotted in here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, c2_msra_fill, get_norm
from .resnet import RESNET_STAGES

Dtype = Any


def _avg_pool(x, window, stride, padding):
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)),
                       count_include_pad=False)


class SplAtConv2d(nn.Module):
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1  # cardinality
    radix: int = 2
    reduction_factor: int = 4
    norm: str = "BN"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        r, card, c = self.radix, self.groups, self.channels
        inter = max(in_ch * r // self.reduction_factor, 32)

        y = Conv(c * r, self.kernel_size, stride=self.stride,
                 padding=self.dilation, dilation=self.dilation,
                 groups=card * r, use_bias=False, norm=self.norm,
                 train=self.train, axis_name=self.axis_name,
                 kernel_init=c2_msra_fill(), dtype=self.dtype, name="conv")(x)
        y = jax.nn.relu(y)

        # radix split along channels: chunk k = [k*c, (k+1)*c)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.sum(splits, axis=3)  # (B,H,W,c)
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)  # (B,1,1,c)

        gap = Conv(inter, 1, padding=0, groups=card, norm=self.norm,
                   train=self.train, axis_name=self.axis_name,
                   kernel_init=c2_msra_fill(), dtype=self.dtype, name="fc1")(gap)
        gap = jax.nn.relu(gap)
        atten = Conv(c * r, 1, padding=0, groups=card, use_bias=True,
                     kernel_init=c2_msra_fill(), dtype=self.dtype,
                     name="fc2")(gap)  # (B,1,1,c*r)

        # rSoftMax (splat.py:87-101): grouped-conv layout [card][r][c/card],
        # softmax over radix, back to conv layout [r][card][c/card] = [r][c]
        if r > 1:
            a = atten.reshape(b, card, r, c // card)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=2).astype(self.dtype)
            a = jnp.transpose(a, (0, 2, 1, 3)).reshape(b, 1, 1, r, c)
            out = jnp.sum(a * splits, axis=3)
        else:
            a = jax.nn.sigmoid(atten)
            out = a * y
        return out


class DeformConvLayer(nn.Module):
    """(Modulated) deformable 3x3 conv layer — zero-init offset predictor
    (so it starts as a plain conv) + ops/deform_conv.py sampling + norm.

    The TPU-native stand-in for d2's DeformConv/ModulatedDeformConv blocks
    (ref resnest.py:246-413, splat.py:104-183; SURVEY §2.3)."""

    features: int
    stride: int = 1
    dilation: int = 1
    modulated: bool = True
    norm: str = "FrozenBN"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d
        from .layers import get_norm

        in_ch = x.shape[-1]
        k2 = 9
        off_ch = 3 * k2 if self.modulated else 2 * k2
        pred = nn.Conv(
            off_ch, (3, 3), strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="offset_conv",
        )(x)
        if self.modulated:
            offsets = pred[..., : 2 * k2]
            mask = jax.nn.sigmoid(pred[..., 2 * k2 :].astype(jnp.float32))
        else:
            offsets = pred
            mask = None
        weight = self.param(
            "kernel", c2_msra_fill(), (3, 3, in_ch, self.features)
        )
        y = deform_conv2d(
            x.astype(jnp.float32), offsets.astype(jnp.float32),
            weight.astype(jnp.float32),
            mask=mask, stride=self.stride, padding=self.dilation,
            dilation=self.dilation,
        ).astype(self.dtype)
        n = get_norm(self.norm, self.features, dtype=self.dtype,
                     train=self.train, axis_name=self.axis_name)
        return n(y) if n is not None else y


class ResNeStBottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = False
    dilation: int = 1
    radix: int = 2
    bottleneck_width: int = 64
    avd: bool = True
    avg_down: bool = True
    deform: bool = False
    deform_modulated: bool = True
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        card = self.num_groups
        group_width = int(self.bottleneck_channels * (self.bottleneck_width / 64.0)) * card
        avd = self.avd and (self.stride > 1)
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        common = dict(norm=self.norm, train=self.train, axis_name=self.axis_name,
                      use_bias=False, kernel_init=c2_msra_fill(), dtype=self.dtype)

        out = jax.nn.relu(
            Conv(group_width, 1, stride=stride_1x1, padding=0, name="conv1", **common)(x)
        )
        if self.deform:
            # DCN variant (ref DeformBottleneckBlock); applies the deformable
            # conv in place of conv2 (SplAt's DCN fuses similarly)
            out = jax.nn.relu(
                DeformConvLayer(
                    group_width, stride=1 if avd else stride_3x3,
                    dilation=self.dilation, modulated=self.deform_modulated,
                    norm=self.norm, train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype, name="conv2",
                )(out)
            )
        elif self.radix > 1:
            out = SplAtConv2d(
                group_width, 3, stride=1 if avd else stride_3x3,
                dilation=self.dilation, groups=card, radix=self.radix,
                norm=self.norm, train=self.train, axis_name=self.axis_name,
                dtype=self.dtype, name="conv2",
            )(out)
        else:
            out = jax.nn.relu(
                Conv(group_width, 3, stride=1 if avd else stride_3x3,
                     padding=self.dilation, dilation=self.dilation,
                     groups=card, name="conv2", **common)(out)
            )
        if avd:
            out = _avg_pool(out, 3, self.stride, 1)

        out = Conv(self.out_channels, 1, padding=0, name="conv3", **common)(out)

        if in_channels != self.out_channels:
            s = x
            if self.avg_down:
                if self.stride > 1:
                    s = _avg_pool(s, self.stride, self.stride, 0)
                shortcut = Conv(self.out_channels, 1, stride=1, padding=0,
                                name="shortcut", **common)(s)
            else:
                shortcut = Conv(self.out_channels, 1, stride=self.stride,
                                padding=0, name="shortcut", **common)(s)
        else:
            shortcut = x
        return jax.nn.relu(out + shortcut)


class DeepStem(nn.Module):
    stem_width: int = 64
    norm: str = "FrozenBN"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(norm=self.norm, train=self.train, axis_name=self.axis_name,
                      use_bias=False, kernel_init=c2_msra_fill(), dtype=self.dtype)
        y = jax.nn.relu(Conv(self.stem_width, 3, stride=2, padding=1,
                             name="conv1_1", **common)(x))
        y = jax.nn.relu(Conv(self.stem_width, 3, stride=1, padding=1,
                             name="conv1_2", **common)(y))
        y = jax.nn.relu(Conv(self.stem_width * 2, 3, stride=1, padding=1,
                             name="conv1_3", **common)(y))
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class ResNeSt(nn.Module):
    depth: int = 101
    norm: str = "FrozenBN"
    radix: int = 2
    bottleneck_width: int = 64
    deep_stem: bool = True
    avd: bool = True
    avg_down: bool = True
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = False
    res5_dilation: int = 1
    res2_out_channels: int = 256
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = True
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        stem_width = {50: 32, 101: 64, 152: 64}[self.depth]
        y = DeepStem(stem_width, self.norm, self.train, self.axis_name,
                     self.dtype, name="stem")(x.astype(self.dtype))

        stage_blocks = RESNET_STAGES[self.depth]
        out: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        max_stage = max(
            int(f[len("res"):]) for f in self.out_features if f.startswith("res")
        )
        for idx, stage in enumerate(range(2, 6)):
            if stage > max_stage:
                break
            first_stride = 1 if stage == 2 else 2
            dilation = self.res5_dilation if stage == 5 else 1
            if stage == 5 and self.res5_dilation == 2:
                first_stride = 1
            for b in range(stage_blocks[idx]):
                y = ResNeStBottleneck(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=first_stride if b == 0 else 1,
                    num_groups=self.num_groups,
                    norm=self.norm,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    radix=self.radix,
                    bottleneck_width=self.bottleneck_width,
                    avd=self.avd,
                    avg_down=self.avg_down,
                    deform=self.deform_on_per_stage[idx],
                    deform_modulated=self.deform_modulated,
                    train=self.train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"res{stage}/block{b}",
                )(y)
            if f"res{stage}" in self.out_features:
                out[f"res{stage}"] = y
            out_channels *= 2
            bottleneck_channels *= 2
        return out


def build_resnest(cfg, train: bool = False, axis_name=None, dtype=jnp.float32) -> ResNeSt:
    r = cfg.MODEL.RESNETS
    radix = r.RADIX
    # silent-config-key guard: ops/deform_conv.py implements ONE offset
    # group over an ungrouped conv; other values would build a model
    # architecturally different from the d2 reference with no error
    if any(r.DEFORM_ON_PER_STAGE):
        if r.DEFORM_NUM_GROUPS != 1:
            raise NotImplementedError(
                "MODEL.RESNETS.DEFORM_NUM_GROUPS != 1 is not supported "
                "(deform_conv2d predicts a single offset group)"
            )
        if r.NUM_GROUPS != 1:
            raise NotImplementedError(
                "deformable conv with MODEL.RESNETS.NUM_GROUPS != 1 "
                "(grouped/ResNeXt conv2) is not supported"
            )
    return ResNeSt(
        depth=r.DEPTH,
        norm=r.NORM,
        radix=radix,
        bottleneck_width=r.BOTTLENECK_WIDTH,
        deep_stem=r.DEEP_STEM or radix > 1,
        avd=r.AVD or radix > 1,
        avg_down=r.AVG_DOWN or radix > 1,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        out_features=tuple(r.OUT_FEATURES),
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=r.DEFORM_MODULATED,
        train=train,
        axis_name=axis_name,
        dtype=dtype,
    )

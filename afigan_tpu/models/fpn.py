"""Feature Pyramid Network with a pluggable top-down interpolator.

TPU-native redesign of the reference's ``FPN_AFIGAN``
(ref: afigan/modeling/backbone/fpn_sr.py:20-166): a d2-style FPN whose
top-down 2x upsampling step is a *pluggable function* —
  * "nearest"  — plain d2 FPN (guide model / baselines)
  * "bilinear" — ablation
  * "afi"      — the shared AF interpolator (``srf_module``, ref :65,151)

One FPN class covers both the reference's plain ``build_resnet_fpn_backbone``
(guide) and ``build_*_fpn_sr_backbone`` variants. The AFI generator is a
single shared submodule applied at every top-down step, exactly like the
reference's one srf_module called 3x per forward (SURVEY §3.5).

``LastLevelMaxPool`` produces p6 via stride-2 subsample (ref :187-199);
``LastLevelP6P7`` (for FCOS/RetinaNet-style heads) via stride-2 convs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    Conv,
    c2_xavier_fill,
    bilinear_upsample_x2,
    max_pool_stride2,
    nearest_upsample_x2,
)
from .afi import AFIGenerator

Dtype = Any


class FPN(nn.Module):
    """FPN over bottom-up features {res2..res5} (or Swin stages).

    Returns {"p2": ..., "p6"} (strides 4..64) for RCNN-family heads, or
    p3..p7 when configured with LastLevelP6P7.
    """

    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    in_strides: Sequence[int] = (4, 8, 16, 32)
    out_channels: int = 256
    norm: str = ""
    fuse_type: str = "sum"
    interp: str = "afi"  # "nearest" | "bilinear" | "afi"
    top_block: str = "maxpool"  # "maxpool" | "p6p7" | ""
    top_block_in_feature: str = "p5"  # "p5" or e.g. "res5" for p6p7
    afi_n_rdb: int = 3
    afi_growth_rate: int = 32
    afi_residual_scale: float = 0.2
    afi_fused: bool = False
    afi_remat: bool = False
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _make_interp(self):
        if self.interp == "afi":
            srf = AFIGenerator(
                in_channels=self.out_channels,
                n_rdb=self.afi_n_rdb,
                growth_rate=self.afi_growth_rate,
                residual_scale=self.afi_residual_scale,
                dtype=self.dtype,
                fused=self.afi_fused,
                remat=self.afi_remat,
                name="srf_module",
            )
            return srf
        if self.interp == "nearest":
            return nearest_upsample_x2
        if self.interp == "bilinear":
            return bilinear_upsample_x2
        raise ValueError(f"Unknown interp: {self.interp}")

    @nn.compact
    def __call__(self, bottom_up_features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        stages = [np_log2(s) for s in self.in_strides]
        interp = self._make_interp()

        conv_kw = dict(
            norm=self.norm, train=self.train, axis_name=self.axis_name,
            use_bias=(self.norm == ""), kernel_init=c2_xavier_fill(),
            dtype=self.dtype,
        )

        # top-down pass, low→high resolution
        feats = [bottom_up_features[f] for f in self.in_features][::-1]
        rev_stages = stages[::-1]
        results: List[jnp.ndarray] = []
        prev = Conv(self.out_channels, 1, padding=0,
                    name=f"fpn_lateral{rev_stages[0]}", **conv_kw)(feats[0])
        results.append(
            Conv(self.out_channels, 3, padding=1,
                 name=f"fpn_output{rev_stages[0]}", **conv_kw)(prev)
        )
        for feat, stage in zip(feats[1:], rev_stages[1:]):
            top_down = interp(prev)
            lateral = Conv(self.out_channels, 1, padding=0,
                           name=f"fpn_lateral{stage}", **conv_kw)(feat)
            # guard odd-sized pyramids (inputs should be padded to x64;
            # crop keeps non-conforming shapes working instead of crashing)
            top_down = top_down[:, : lateral.shape[1], : lateral.shape[2]]
            prev = lateral + top_down
            if self.fuse_type == "avg":
                prev = prev / 2
            results.insert(
                0,
                Conv(self.out_channels, 3, padding=1,
                     name=f"fpn_output{stage}", **conv_kw)(prev),
            )

        out = {f"p{s}": r for s, r in zip(stages, results)}
        last_stage = stages[-1]
        if self.top_block == "maxpool":
            out[f"p{last_stage + 1}"] = max_pool_stride2(out[f"p{last_stage}"])
        elif self.top_block == "p6p7":
            src = (
                bottom_up_features[self.top_block_in_feature]
                if self.top_block_in_feature in bottom_up_features
                else out[self.top_block_in_feature]
            )
            p6 = Conv(self.out_channels, 3, stride=2, padding=1,
                      name="top_block/p6", kernel_init=c2_xavier_fill(),
                      dtype=self.dtype)(src)
            p7 = Conv(self.out_channels, 3, stride=2, padding=1,
                      name="top_block/p7", kernel_init=c2_xavier_fill(),
                      dtype=self.dtype)(jax.nn.relu(p6))
            out[f"p{last_stage + 1}"] = p6
            out[f"p{last_stage + 2}"] = p7
        return out

    def out_feature_strides(self) -> Dict[str, int]:
        stages = [int(np_log2(s)) for s in self.in_strides]
        d = {f"p{s}": 2**s for s in stages}
        last = stages[-1]
        if self.top_block == "maxpool":
            d[f"p{last + 1}"] = 2 ** (last + 1)
        elif self.top_block == "p6p7":
            d[f"p{last + 1}"] = 2 ** (last + 1)
            d[f"p{last + 2}"] = 2 ** (last + 2)
        return d


def np_log2(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    return n

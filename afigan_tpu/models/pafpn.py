"""Path-Aggregation FPN (PAFPN) with pluggable top-down interpolator.

Parity with the reference ``PAFPN_AFIGAN``
(ref: afigan/modeling/backbone/pafpn_sr.py:104-193): FPN-style top-down
pass (laterals + srf/nearest 2x upsample, NO output convs yet) followed by
a bottom-up augmentation path — n2 = td2; n_{k+1} = td_{k+1} +
relu(downsample_conv(n_k)) with stride-2 3x3 convs; output convs applied
to n2..n5; p6 via stride-2 subsample of p5 (LastLevelMaxPool).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, c2_xavier_fill, max_pool_stride2
from .fpn import FPN, np_log2


class PAFPN(FPN):
    """Inherits the pluggable-interp machinery from FPN."""

    @nn.compact
    def __call__(self, bottom_up_features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        stages = [np_log2(s) for s in self.in_strides]
        interp = self._make_interp()
        conv_kw = dict(
            norm=self.norm, train=self.train, axis_name=self.axis_name,
            use_bias=(self.norm == ""), kernel_init=c2_xavier_fill(),
            dtype=self.dtype,
        )

        # ---- top-down pathway (no output convs yet, ref :171-181) ----
        feats = [bottom_up_features[f] for f in self.in_features][::-1]
        rev_stages = stages[::-1]
        prev = Conv(self.out_channels, 1, padding=0,
                    name=f"fpn_lateral{rev_stages[0]}", **conv_kw)(feats[0])
        topdown: List[jnp.ndarray] = [prev]  # low→high res order reversed below
        for feat, stage in zip(feats[1:], rev_stages[1:]):
            td = interp(prev)
            lateral = Conv(self.out_channels, 1, padding=0,
                           name=f"fpn_lateral{stage}", **conv_kw)(feat)
            td = td[:, : lateral.shape[1], : lateral.shape[2]]
            prev = lateral + td
            if self.fuse_type == "avg":
                prev = prev / 2
            topdown.insert(0, prev)  # ends as [td2, td3, td4, td5]

        # ---- bottom-up augmentation (ref :186-193) ----
        results = []
        pa_prev = topdown[0]
        results.append(
            Conv(self.out_channels, 3, padding=1,
                 name=f"pafpn_output{stages[0]}", **conv_kw)(pa_prev)
        )
        for inter, stage in zip(topdown[1:], stages[1:]):
            down = Conv(self.out_channels, 3, stride=2, padding=1,
                        name=f"pafpn_downsample{stage}", **conv_kw)(pa_prev)
            pa_prev = inter + jax.nn.relu(down)
            if self.fuse_type == "avg":
                pa_prev = pa_prev / 2
            results.append(
                Conv(self.out_channels, 3, padding=1,
                     name=f"pafpn_output{stage}", **conv_kw)(pa_prev)
            )

        out = {f"p{s}": r for s, r in zip(stages, results)}
        last = stages[-1]
        if self.top_block == "maxpool":
            out[f"p{last + 1}"] = max_pool_stride2(out[f"p{last}"])
        return out

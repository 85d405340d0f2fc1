"""BiFPN (EfficientDet-style) with AFI upsampling — rolled, TPU-native.

Parity with the reference ``BiFPN_AFIGAN``
(ref: afigan/modeling/backbone/bifpn_sr.py:203-733): P3-P7 pyramid on
Swin stages, per-layer ReLU-normalized fusion weights (:531-533), all
2x upsampling through ONE shared AF interpolator (:539-540 — 4 calls per
layer), 3x3/s2 SAME max-pool downsampling, swish + SeparableConv fusion
nodes, and the reference's (non-standard) wiring where the bottom-up pass
of EVERY layer re-reads the BeforeBiFPN laterals as skip inputs
(:578-588, :597-...). The unrolled-7-layers quirk (Q7: FPN_REPEAT ignored)
is fixed — ``fpn_repeat`` is honored; 7 reproduces the reference exactly.

BeforeBiFPN (:159-201): 1x1+BN laterals for c3..c5, dedicated 1x1+BN skip
convs for c4/c5, and LastLevelP6P7 (:773-788): p6 = maxpool(BN(1x1(c5))),
p7 = maxpool(p6).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, SeparableConv, c2_xavier_fill, get_norm
from .afi import AFIGenerator

Dtype = Any


def _maxpool_same_s2(x):
    """Exact replica of the reference MaxPool2d(3, 2, 'static_same')
    (ref wrappers.py:224-253): ZERO-pad right/bottom by (k - s) = 1, then
    VALID 3x3/s2 max pool. Differs from lax 'SAME' on odd inputs (output
    floor((H-1)/2)+1, not ceil(H/2)) and includes the zero padding in the
    max (F.pad default), both of which matter for checkpoint parity."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def _swish(x):
    return x * jax.nn.sigmoid(x)


class BiFPN(nn.Module):
    in_features: Sequence[str] = ("stage3", "stage4", "stage5")
    out_channels: int = 256
    fpn_repeat: int = 7
    norm: str = "SyncBN"
    interp: str = "afi"
    eps: float = 1e-4
    afi_n_rdb: int = 3
    afi_growth_rate: int = 32
    afi_residual_scale: float = 0.2
    afi_fused: bool = False
    afi_remat: bool = False
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _fuse(self, name: str, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        """Weighted fusion with RAW learned weights (ref quirk).

        The reference defines _weight_act (relu + normalize, :531-533,
        EfficientDet-style) but its unrolled forward never calls it: each
        _feature_funsion fetches the raw Parameter and _attention computes
        sum(w_i * x_i) directly (:542-563) — no relu, no normalization.
        Matched exactly for checkpoint parity (init ones == plain sum)."""
        w = self.param(name, nn.initializers.ones, (len(inputs),))
        w = w.astype(jnp.float32)
        return sum(x * wi.astype(x.dtype) for x, wi in zip(inputs, w))

    @nn.compact
    def __call__(self, bottom_up_features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.interp == "afi":
            srf = AFIGenerator(
                in_channels=self.out_channels, n_rdb=self.afi_n_rdb,
                growth_rate=self.afi_growth_rate,
                residual_scale=self.afi_residual_scale,
                dtype=self.dtype, fused=self.afi_fused,
                remat=self.afi_remat, name="srf_module",
            )

            def up(x, target_hw):
                y = srf(x)
                return y[:, : target_hw[0], : target_hw[1]]
        else:
            def up(x, target_hw):
                b, h, w, c = x.shape
                y = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                return y[:, : target_hw[0], : target_hw[1]]

        def bn(name):
            # ref BiFPN BNs: eps 1e-3, torch momentum 0.01 (== flax 0.99).
            # SyncBN passes through (psum over the data axis when meshed).
            return get_norm(self.norm, self.out_channels, dtype=self.dtype,
                            train=self.train, axis_name=self.axis_name,
                            name=f"{name}_bn", bn_eps=1e-3, bn_momentum=0.99)

        c3, c4, c5 = (bottom_up_features[f] for f in self.in_features)
        # size_divisibility contract (ref bifpn_sr.py:526): the p3..p7
        # exact-2x up/down paths require every level to halve evenly, i.e.
        # a 128-divisible input canvas => c5 (stride 32) divisible by 4.
        # choose_bucket(required_size_divisibility(cfg)) guarantees this
        # in the data path; catch misuse at trace time.
        if c5.shape[1] % 4 or c5.shape[2] % 4:
            raise ValueError(
                f"BiFPN needs a 128-divisible input canvas (c5 {c5.shape[1:3]} "
                "must be divisible by 4); pad images with "
                "choose_bucket(..., required_size_divisibility(cfg))"
            )

        # ---- BeforeBiFPN ----
        def lateral(x, name):
            y = Conv(self.out_channels, 1, padding=0, use_bias=True,
                     kernel_init=c2_xavier_fill(), dtype=self.dtype,
                     name=name)(x)
            n = bn(name)
            return n(y) if n is not None else y

        p3_in = lateral(c3, "lateral3")
        p4_in = lateral(c4, "lateral4")
        p5_in = lateral(c5, "lateral5")
        p4_skip = lateral(c4, "p4_skip")
        p5_skip = lateral(c5, "p5_skip")
        p6_in = _maxpool_same_s2(lateral(c5, "p6_resample"))
        p7_in = _maxpool_same_s2(p6_in)

        laterals = (p3_in, p4_in, p5_in, p6_in, p7_in)
        feats = laterals

        sep_kw = dict(norm=self.norm, train=self.train, axis_name=self.axis_name,
                      dtype=self.dtype, bn_eps=1e-3, bn_momentum=0.99)

        for l in range(self.fpn_repeat):
            p3, p4, p5, p6, p7 = feats

            # ---- top-down ----
            def td(cur, top, idx):
                fused = self._fuse(
                    f"layer{l}_p{idx}_w1",
                    [cur, up(top, cur.shape[1:3])],
                )
                return SeparableConv(self.out_channels, 3,
                                     name=f"layer{l}_conv{idx}_up", **sep_kw)(_swish(fused))

            p6_up = td(p6, p7, 6)
            p5_up = td(p5, p6_up, 5)
            p4_up = td(p4, p5_up, 4)
            p3_up = td(p3, p4_up, 3)

            # ---- bottom-up: skips always read the BeforeBiFPN laterals ----
            skip4 = p4_skip if l == 0 else laterals[1]
            skip5 = p5_skip if l == 0 else laterals[2]
            skip6 = laterals[3]
            p7_lat = laterals[4]

            def bu(skip, cur, bottom, idx):
                down = _maxpool_same_s2(bottom)
                inputs = ([skip, cur, down] if skip is not None else [cur, down])
                fused = self._fuse(f"layer{l}_p{idx}_w2", inputs)
                return SeparableConv(self.out_channels, 3,
                                     name=f"layer{l}_conv{idx}_down", **sep_kw)(_swish(fused))

            p4_out = bu(skip4, p4_up, p3_up, 4)
            p5_out = bu(skip5, p5_up, p4_out, 5)
            p6_out = bu(skip6, p6_up, p5_out, 6)
            p7_out = bu(None, p7_lat, p6_out, 7)
            feats = (p3_up, p4_out, p5_out, p6_out, p7_out)

        return {f"p{i+3}": f for i, f in enumerate(feats)}

"""Shared layer primitives (Flax, NHWC, TPU-first).

Covers the d2-layer surface the reference uses: Conv2d (+norm+activation),
ConvTranspose2d with torch-compatible (kernel, stride, padding) semantics,
FrozenBatchNorm, GroupNorm, BatchNorm ("BN") and cross-replica SyncBN
(psum over the `data` mesh axis — the TPU-native replacement for NCCL
SyncBatchNorm, SURVEY §2.3), plus torch-matching weight initializers
(c2_msra_fill, c2_xavier_fill, kaiming x0.1) and bilinear 2x upsampling
matching ``F.interpolate(..., mode="bilinear", align_corners=False)``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# Initializers (torch-numerics-compatible)
# ---------------------------------------------------------------------------

def kaiming_normal_scaled(scale: float = 1.0, mode: str = "fan_in"):
    """torch kaiming_normal_(a=0) followed by ``weight *= scale``.

    std = scale * sqrt(2 / fan)  →  variance_scaling(2 * scale², mode, normal).
    (ref: generator_rdb.py:57-62 uses kaiming_normal then x0.1)
    """
    return nn.initializers.variance_scaling(2.0 * scale * scale, mode, "normal")


def c2_msra_fill():
    """Caffe2 MSRAFill == kaiming_normal(fan_out, relu)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def c2_xavier_fill():
    """Caffe2 XavierFill == fvcore c2_xavier_fill == kaiming_uniform_(a=1).

    gain = sqrt(2 / (1 + a^2)) = 1 for a=1, i.e. variance scale 1.0 fan_in
    uniform (NOT 2.0 — that would be kaiming_uniform(a=0), sqrt(2) too wide).
    """
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and (non-trained) affine params.

    Matches d2 FrozenBatchNorm2d: out = (x - mean) / sqrt(var + eps) * w + b.
    All four arrays live in the ``params`` collection; the optimizer masks
    them out (they are buffers, ref d2 resnet NORM="FrozenBN").
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses into the preceding conv)
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


def get_norm(norm: str, features: int, *, dtype=jnp.float32,
             train: bool = False, axis_name: Optional[str] = None,
             name: str = "norm", bn_eps: float = 1e-5,
             bn_momentum: float = 0.9):
    """d2 get_norm equivalent: '' | 'BN' | 'SyncBN' | 'FrozenBN' | 'GN'.

    "SyncBN" is BatchNorm with batch stats psum-averaged over the data
    mesh axis (the TPU-native NCCL SyncBatchNorm); outside any mesh
    context it degrades to plain BatchNorm.

    ``bn_momentum`` uses the FLAX convention (ema = m*ema + (1-m)*new);
    torch momentum 0.01 == flax momentum 0.99 (BiFPN BNs).
    """
    if not norm:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    if norm in ("BN", "SyncBN"):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=bn_momentum,
            epsilon=bn_eps,
            axis_name=axis_name if norm == "SyncBN" else None,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
    if norm == "GN":
        # torch GroupNorm eps is 1e-5; flax defaults to 1e-6 — parity
        # requires the explicit value (GN heads: FCOS towers, d2 GN heads)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype,
                            param_dtype=jnp.float32, name=name)
    raise ValueError(f"Unknown norm: {norm}")


# ---------------------------------------------------------------------------
# Convs
# ---------------------------------------------------------------------------

class Conv(nn.Module):
    """Conv2d with optional norm and activation (d2 Conv2d surface), NHWC."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = None  # None → torch-style symmetric int padding (k//2 default not applied)
    groups: int = 1
    use_bias: bool = True
    dilation: int = 1
    norm: str = ""
    activation: Optional[Callable] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad is None:
            pad = 0
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features, dtype=self.dtype,
                        train=self.train, axis_name=self.axis_name)
        if norm is not None:
            y = norm(y)
        if self.activation is not None:
            y = self.activation(y)
        return y


class ConvTranspose(nn.Module):
    """torch-compatible ConvTranspose2d(k, s, p): out = in * s (for k=2p+s).

    Semantics: torch's transposed conv == conv_general_dilated(x, flip(W),
    lhs_dilation=s, padding=k-1-p) (the gradient-of-conv definition; used
    by the AFI generator upsampler, ref generator_rdb.py:101-105).

    TPU lowering: for stride 2 (the only stride used) the lhs-dilated conv
    is decomposed into 4 **subpixel phase convolutions** — even/odd output
    rows and columns each come from a dense (k/2 x k/2)-tap conv over the
    undilated input, interleaved at the end. Identical numerics, but every
    matmul is dense on the MXU instead of XLA convolving a half-zeros
    dilated tensor.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # Stored HWIO (k, k, in, out) — converter maps torch's (in, out, k, k).
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        k, s, p = self.kernel_size, self.stride, self.padding
        pp = k - 1 - p

        # the phase decomposition assumes out == 2h exactly, i.e.
        # k == 2p + 2 (true for every in-repo deconv: k4s2p1, k6s2p2);
        # other valid torch configs (e.g. k4s2p0 → out 2h+2) must take
        # the generic lhs-dilated path or they'd get silently wrong
        # shapes/borders
        if s == 2 and k % 2 == 0 and k == 2 * p + 2:
            y = self._phase_decomposed(x, kernel, k, pp)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                jnp.flip(kernel, (0, 1)).astype(self.dtype),
                window_strides=(1, 1),
                padding=[(pp, pp), (pp, pp)],
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y

    def _phase_decomposed(self, x, kernel, k, pp):
        """out[2i+d] = Σ_m Wf[m]·x[(2i+d-pp+m)/2] over m with matching
        parity — a (k/2)-tap dense conv per output parity, per axis."""
        wf = jnp.flip(kernel, (0, 1)).astype(self.dtype)
        xt = x.astype(self.dtype)
        b, h, w, _ = x.shape
        half = k // 2

        def phase_taps(d):
            # m parity for output index 2i+d: (2i+d-pp+m) even ⇔ m ≡ pp-d (2)
            ms = [m for m in range(k) if (m - (pp - d)) % 2 == 0]
            # tap offsets in x: t = (d - pp + m) // 2  (relative to i)
            ts = [(d - pp + m) // 2 for m in ms]
            return ms, ts

        phases = {}
        for dy in (0, 1):
            msy, tsy = phase_taps(dy)
            for dx in (0, 1):
                msx, tsx = phase_taps(dx)
                # dense (half x half) kernel for this phase; taps span
                # x[i + min(ts) .. i + max(ts)] → symmetric padding
                wp = wf[jnp.asarray(msy)][:, jnp.asarray(msx)]
                # taps are consecutive (step 1): pad = (-min, max)
                pad_y = (-min(tsy), max(tsy))
                pad_x = (-min(tsx), max(tsx))
                phases[(dy, dx)] = jax.lax.conv_general_dilated(
                    xt, wp, (1, 1),
                    padding=[(pad_y[0], pad_y[1]), (pad_x[0], pad_x[1])],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

        # interleave: out[2i+dy, 2j+dx] = phases[(dy, dx)][i, j]
        row0 = jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3)  # (B,H,W,2,C)
        row1 = jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3)
        both = jnp.stack([row0, row1], axis=2)  # (B,H,2,W,2,C)
        return both.reshape(b, 2 * h, 2 * w, self.features)


class SeparableConv(nn.Module):
    """Depthwise-separable conv with TF-style SAME padding (BiFPN primitive).

    Matches the reference's bifpn_layers/wrappers.py SeparableConv2d
    (depthwise 3x3 'same' + pointwise 1x1 + optional norm).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = ""
    activation: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    train: bool = False
    axis_name: Optional[str] = None
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = nn.Conv(
            features=in_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depthwise",
        )(x)
        y = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(y)
        norm = get_norm(self.norm, self.features, dtype=self.dtype,
                        train=self.train, axis_name=self.axis_name,
                        bn_eps=self.bn_eps, bn_momentum=self.bn_momentum)
        if norm is not None:
            y = norm(y)
        if self.activation is not None:
            y = self.activation(y)
        return y


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------

def bilinear_upsample_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel centers (torch align_corners=False).

    Matches ``F.interpolate(x, scale_factor=2, mode="bilinear")`` used for
    the AFI generator's skip connection (ref generator_rdb.py:125).
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def nearest_upsample_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (d2 FPN default top-down interp)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def max_pool_stride2(x: jnp.ndarray) -> jnp.ndarray:
    """kernel-1 stride-2 max pool == strided subsample (ref fpn_sr.py:199)."""
    return x[:, ::2, ::2, :]


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)

"""(Modulated) deformable convolution — gather-based, pure XLA.

TPU-native replacement for d2's DeformConv/ModulatedDeformConv CUDA
kernels (SURVEY §2.3), used by ResNeSt's DCN bottleneck variant
(ref resnest.py:246-413, splat.py:104-183). Design: for every output
position and kernel tap, bilinearly sample the input at
``p + p_k + offset_k`` (zeros outside), optionally scale by the
modulation mask, then contract the (tap, channel) axis with the kernel
as ONE large MXU matmul — the deformable part is a gather, the FLOPs
stay on the systolic array.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def deform_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin)
    offsets: jnp.ndarray,  # (B, Ho, Wo, 2*K) — (dy, dx) per tap, torch order
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout) HWIO
    mask: Optional[jnp.ndarray] = None,  # (B, Ho, Wo, K) modulation
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per tap
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,kh,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offsets.reshape(b, ho, wo, k, 2)
    sy = base_y[None] + off[..., 0]
    sx = base_x[None] + off[..., 1]

    def sample_image(img, yy, xx):
        """img (H,W,Cin); yy/xx (Ho,Wo,K) -> (Ho,Wo,K,Cin)."""
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        ly = yy - y0
        lx = xx - x0

        def take(iy, ix):
            vy = (iy >= 0) & (iy < h)
            vx = (ix >= 0) & (ix < w)
            v = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
            return jnp.where((vy & vx)[..., None], v, 0.0)

        v00 = take(y0, x0)
        v01 = take(y0, x0 + 1)
        v10 = take(y0 + 1, x0)
        v11 = take(y0 + 1, x0 + 1)
        return (
            v00 * ((1 - ly) * (1 - lx))[..., None]
            + v01 * ((1 - ly) * lx)[..., None]
            + v10 * (ly * (1 - lx))[..., None]
            + v11 * (ly * lx)[..., None]
        )

    sampled = jax.vmap(sample_image)(x.astype(jnp.float32), sy, sx)
    if mask is not None:
        sampled = sampled * mask.reshape(b, ho, wo, k, 1)

    # contract (K, Cin) with the kernel on the MXU
    flat = sampled.reshape(b, ho, wo, k * cin)
    wmat = weight.astype(jnp.float32).reshape(k, cin, cout).reshape(k * cin, cout)
    return jnp.einsum("bhwf,fo->bhwo", flat, wmat)

"""Fused ResidualDenseBlock chain — Pallas TPU kernel (the AFI hot path).

The AFI generator's cost is dominated by its RDBs: 5 densely-connected
3x3 convs per block, 3 blocks, invoked 3-28x per pyramid forward at the
largest feature resolutions (SURVEY §3.5; BASELINE.json north star:
"the AF interpolator becomes a fused Pallas conv-upsample kernel").

Why a kernel: under XLA each dense conv materializes its concatenated
input (cat(x, c1, ..., ci) — up to 384 channels) in HBM. This kernel
keeps the WHOLE chain in VMEM per spatial tile:

  * grid over (batch, h_tiles, w_tiles); each program DMAs its input tile
    with a 5-pixel halo (one pixel per chained 3x3 conv) from HBM,
    zero-padding at image borders — border zeros reproduce the convs'
    `padding=1` semantics exactly.
  * each 3x3 conv is computed as 9 shifted (M, Cin) x (Cin, Cout) MXU
    matmuls accumulating in fp32; concatenation is NEVER materialized —
    conv_i over cat(x, c1..c_{i-1}) is a sum of per-input matmul groups.
  * intermediates c1..c4 live in VMEM with shrinking halos (4,3,2,1);
    the final residual add (x + 0.2 * c5) is fused into the store.

Numerics match models/afi/generator.py ResidualDenseBlock (LeakyReLU 0.2
after convs 1-4, no bias, residual scale 0.2; ref generator_rdb.py:33-71).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5  # one pixel per chained 3x3 conv
PAD = 8  # DMA alignment: Mosaic requires 8-aligned sublane slice sizes,
# so the input is padded with 8 (not 5) and the kernel trims the extra 3.


def _conv3x3_from_ref(ref, base, w_ref, out_h, out_w, acc=None):
    """3x3 conv reading patches DIRECTLY from a scratch ref → fp32 acc.

    Implemented as 9 shifted matmuls on the MXU. Slicing the ref per
    (dy, dx) keeps each patch load transient (live only for its matmul):
    materializing the whole window as a value first kept ~20 MB live and
    blew the 16 MB VMEM stack limit (the round-1 'Mosaic SIGKILL').

    ``base``: static offset of the output's logical origin within the
    ref = source_halo - out_halo - 1.
    """
    cin = ref.shape[-1]
    cout = w_ref.shape[-1]
    if acc is None:
        acc = jnp.zeros((out_h * out_w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = ref[base + dy : base + dy + out_h,
                        base + dx : base + dx + out_w, :].reshape(-1, cin)
            acc = acc + jnp.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    return acc


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _inside_image_mask(ti, tj, tile_h, tile_w, halo, out_h, out_w, h, w):
    """(out_h, out_w, 1) mask: 1 where the position lies inside the true
    image extent. The reference zero-pads EVERY dense conv's input
    (padding=1 per conv) — so intermediates must read as zero outside the
    image, not as conv-of-border values."""
    row0 = ti * tile_h - halo
    col0 = tj * tile_w - halo
    rows = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1) + col0
    ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    # NOTE: minor-dim insertion on i1 vectors is unsupported by Mosaic —
    # cast to f32 BEFORE adding the channel dim.
    return ok.astype(jnp.float32)[..., None]


def _rdb_kernel(x_hbm, w1, w2x, w2c1, w3x, w3c1, w3c2, w4x, w4c1, w4c2, w4c3,
                w5x, w5c1, w5c2, w5c3, w5c4,
                out_ref, xs, c1s, c2s, c3s, c4s, dma_sem,
                *, tile_h, tile_w, channels, growth, h, w, residual_scale):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    # ---- DMA the input tile + 8-px apron (8-aligned sizes for Mosaic;
    # input is pre-padded with PAD zeros on every side) ----
    cp = pltpu.make_async_copy(
        x_hbm.at[
            bi,
            pl.ds(ti * tile_h, tile_h + 2 * PAD),
            pl.ds(tj * tile_w, tile_w + 2 * PAD),
            :,
        ],
        xs,
        dma_sem,
    )
    cp.start()
    cp.wait()

    f32 = jnp.float32
    # Patches are sliced straight off the scratch refs (never a whole
    # window value). Offsets: base = source_halo - out_halo - 1, where
    # xs carries halo PAD=8 and c_i carries halo 5-i.

    # conv1: x(halo5) -> c1(halo4)
    h1, w1_ = tile_h + 8, tile_w + 8
    c1 = _leaky(_conv3x3_from_ref(xs, PAD - 5, w1, h1, w1_)).reshape(h1, w1_, growth)
    c1 = c1 * _inside_image_mask(ti, tj, tile_h, tile_w, 4, h1, w1_, h, w)
    c1s[...] = c1.astype(xs.dtype)

    # conv2: [x, c1](halo4) -> c2(halo3)
    h2, w2_ = tile_h + 6, tile_w + 6
    acc = _conv3x3_from_ref(xs, PAD - 4, w2x, h2, w2_)
    acc = _conv3x3_from_ref(c1s, 0, w2c1, h2, w2_, acc)
    c2 = _leaky(acc).reshape(h2, w2_, growth)
    c2 = c2 * _inside_image_mask(ti, tj, tile_h, tile_w, 3, h2, w2_, h, w)
    c2s[...] = c2.astype(xs.dtype)

    # conv3: [x, c1, c2](halo3) -> c3(halo2)
    # (per-input matmul accumulation — conv_i over cat(x, c1..c_{i-1})
    # equals the sum of per-input matmul groups; no concat materialized)
    h3, w3_ = tile_h + 4, tile_w + 4
    acc = _conv3x3_from_ref(xs, PAD - 3, w3x, h3, w3_)
    acc = _conv3x3_from_ref(c1s, 1, w3c1, h3, w3_, acc)
    acc = _conv3x3_from_ref(c2s, 0, w3c2, h3, w3_, acc)
    c3 = _leaky(acc).reshape(h3, w3_, growth)
    c3 = c3 * _inside_image_mask(ti, tj, tile_h, tile_w, 2, h3, w3_, h, w)
    c3s[...] = c3.astype(xs.dtype)

    # conv4: [x, c1, c2, c3](halo2) -> c4(halo1)
    h4, w4_ = tile_h + 2, tile_w + 2
    acc = _conv3x3_from_ref(xs, PAD - 2, w4x, h4, w4_)
    acc = _conv3x3_from_ref(c1s, 2, w4c1, h4, w4_, acc)
    acc = _conv3x3_from_ref(c2s, 1, w4c2, h4, w4_, acc)
    acc = _conv3x3_from_ref(c3s, 0, w4c3, h4, w4_, acc)
    c4 = _leaky(acc).reshape(h4, w4_, growth)
    c4 = c4 * _inside_image_mask(ti, tj, tile_h, tile_w, 1, h4, w4_, h, w)
    c4s[...] = c4.astype(xs.dtype)

    # conv5: [x, c1..c4](halo1) -> c5(tile); out = x + 0.2*c5
    acc = _conv3x3_from_ref(xs, PAD - 1, w5x, tile_h, tile_w)
    acc = _conv3x3_from_ref(c1s, 3, w5c1, tile_h, tile_w, acc)
    acc = _conv3x3_from_ref(c2s, 2, w5c2, tile_h, tile_w, acc)
    acc = _conv3x3_from_ref(c3s, 1, w5c3, tile_h, tile_w, acc)
    acc = _conv3x3_from_ref(c4s, 0, w5c4, tile_h, tile_w, acc)
    center = xs[PAD : PAD + tile_h, PAD : PAD + tile_w, :].astype(f32)
    out = center + residual_scale * acc.reshape(tile_h, tile_w, channels)
    out_ref[...] = out[None].astype(out_ref.dtype)


def fused_rdb(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    residual_scale: float = 0.2,
    tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One ResidualDenseBlock, fused.

    Args:
        x: (B, H, W, C) input (any float dtype; compute fp32 accumulate).
        weights: [w1..w5] HWIO kernels — w1: (3,3,C,G); w_i: (3,3,C+(i-1)G,G);
            w5: (3,3,C+4G,C). (The flax module's conv kernels, ref
            generator_rdb.py dense chain.)
    """
    b, h, w, c = x.shape
    g = weights[0].shape[-1]
    tile_h = min(tile, h)
    tile_w = min(tile, w)
    n_th = -(-h // tile_h)
    n_tw = -(-w // tile_w)
    pad_h = n_th * tile_h - h
    pad_w = n_tw * tile_w - w
    # pad: PAD zeros on all sides (zero halo reproduces the convs' border
    # padding; 8 instead of 5 for DMA alignment) + tile-alignment padding.
    x_in = jnp.pad(
        x, ((0, 0), (PAD, PAD + pad_h), (PAD, PAD + pad_w), (0, 0))
    )
    hp, wp = h + pad_h, w + pad_w

    dtype = x.dtype
    # split each dense conv's kernel per input: cat(x, c1..ci) @ W ==
    # x @ W[:c] + Σ_k c_k @ W[c+(k-1)g : c+kg]
    def seg(wt, k):
        return wt[:, :, c + (k - 1) * g : c + k * g].astype(dtype)

    w1 = weights[0].astype(dtype)
    w2x, w2c1 = weights[1][:, :, :c].astype(dtype), seg(weights[1], 1)
    w3x, w3c1, w3c2 = weights[2][:, :, :c].astype(dtype), seg(weights[2], 1), seg(weights[2], 2)
    w4x, w4c1, w4c2, w4c3 = (
        weights[3][:, :, :c].astype(dtype), seg(weights[3], 1),
        seg(weights[3], 2), seg(weights[3], 3),
    )
    w5x, w5c1, w5c2, w5c3, w5c4 = (
        weights[4][:, :, :c].astype(dtype), seg(weights[4], 1),
        seg(weights[4], 2), seg(weights[4], 3), seg(weights[4], 4),
    )

    kernel = functools.partial(
        _rdb_kernel, tile_h=tile_h, tile_w=tile_w, channels=c, growth=g,
        h=h, w=w, residual_scale=residual_scale,  # TRUE extents (masks)
    )

    vmem = pltpu.VMEM
    # The unrolled 45-matmul chain keeps several shifted (out^2, Cin)
    # patch values live at once; the default 16 MiB scoped-vmem stack is
    # too small at C=256 while the chip has 128 MiB VMEM — raise the
    # kernel's limit instead of shrinking tiles (smaller tiles raise the
    # halo read amplification).
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_th, n_tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd manually
            *[pl.BlockSpec(memory_space=vmem) for _ in range(15)],
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, tile_w, c), lambda bi, i, j: (bi, i, j, 0),
            memory_space=vmem,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), dtype),
        scratch_shapes=[
            vmem((tile_h + 2 * PAD, tile_w + 2 * PAD, c), dtype),
            vmem((tile_h + 8, tile_w + 8, g), dtype),
            vmem((tile_h + 6, tile_w + 6, g), dtype),
            vmem((tile_h + 4, tile_w + 4, g), dtype),
            vmem((tile_h + 2, tile_w + 2, g), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(x_in, w1, w2x, w2c1, w3x, w3c1, w3c2, w4x, w4c1, w4c2, w4c3,
      w5x, w5c1, w5c2, w5c3, w5c4)

    if pad_h or pad_w:
        out = out[:, :h, :w]
    return out

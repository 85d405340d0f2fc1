"""Fused ResidualDenseBlock chain — Pallas TPU kernel (the AFI hot path).

The AFI generator's cost is dominated by its RDBs: 5 densely-connected
3x3 convs per block, 3 blocks, invoked 3-28x per pyramid forward at the
largest feature resolutions (SURVEY §3.5; BASELINE.json north star:
"the AF interpolator becomes a fused Pallas conv-upsample kernel").

Why a kernel: under XLA each dense conv materializes its concatenated
input (cat(x, c1, ..., ci) — up to 384 channels) in HBM. This kernel
keeps the WHOLE chain in VMEM per spatial tile:

  * grid over (batch, h_tiles, w_tiles); each program DMAs its input tile
    with an 8-pixel apron from HBM (zero pre-padding at image borders
    reproduces the convs' `padding=1` semantics exactly).
  * each 3x3 conv is computed as 9 shifted (M, Cin) x (Cin, Cout) MXU
    matmuls accumulating in fp32; concatenation is NEVER materialized —
    conv_i over cat(x, c1..c_{i-1}) is a sum of per-input matmul groups.
  * intermediates c1..c4 stay as SSA values in VMEM with shrinking
    row halos (4,3,2,1); the final residual add (x + 0.2 * c5) is fused
    into the store.

v2 layout design (what makes Mosaic compile fast AND avoids relayouts —
the v1 kernel sliced (oh, ow, Cin) windows with ow < buffer width, so
every one of its 135 patch reshapes forced a strided-copy relayout and
Mosaic took ~17 min per shape):

  * ALL tensors keep FULL buffer width Wb = tile_w + 16 (a multiple of 8
    when tile_w is), so `(rows, Wb, C) -> (rows*Wb, C)` flattens are
    free relabelings (rows are contiguous).
  * a 3x3 conv tap (dy, dx) over the flattened source is then a ROW
    slice at offset (r0 - ho + dy - 1)*Wb + (dx - 1). The row part is a
    multiple of Wb (8-aligned); the ±1 column shift is hoisted into TWO
    whole-array sublane `pltpu.roll`s per source, after which all 9 tap
    slices are 8-aligned and copy-free.
  * convs are computed at full width; the columns that wrap across row
    boundaries produce garbage only in the apron columns, which the
    shrinking-halo bookkeeping guarantees are never read by any valid
    output position, and the final store takes the aligned center
    `[:, 8:8+tile_w]` slice.

Numerics match models/afi/generator.py ResidualDenseBlock (LeakyReLU 0.2
after convs 1-4, no bias, residual scale 0.2; ref generator_rdb.py:33-71).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5  # one pixel per chained 3x3 conv
PAD = 8  # apron: 8 (not 5) so DMA slice sizes and center slices are 8-aligned


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _inside_image_mask(ti, tj, tile_h, tile_w, row_halo, out_rows, wb, h, w):
    """(out_rows, wb, 1) f32 mask: 1 where the position lies inside the
    true image extent. The reference zero-pads EVERY dense conv's input
    (padding=1 per conv) — so intermediates must read as zero outside the
    image, not as conv-of-border values. Full-width: columns span the
    whole apron [-PAD, tile_w + PAD)."""
    row0 = ti * tile_h - row_halo
    col0 = tj * tile_w - PAD
    rows = jax.lax.broadcasted_iota(jnp.int32, (out_rows, wb), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_rows, wb), 1) + col0
    ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    # NOTE: minor-dim insertion on i1 vectors is unsupported by Mosaic —
    # cast to f32 BEFORE adding the channel dim.
    return ok.astype(jnp.float32)[..., None]


def _rdb_kernel(x_hbm, w1, w2x, w2c1, w3x, w3c1, w3c2, w4x, w4c1, w4c2, w4c3,
                w5x, w5c1, w5c2, w5c3, w5c4,
                out_ref, xs, dma_sem,
                *, tile_h, tile_w, channels, growth, h, w, residual_scale):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    wb = tile_w + 2 * PAD

    # ---- DMA the input tile + 8-px apron (input is pre-padded with PAD
    # zeros on every side; interior tiles read true neighbor values) ----
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

    def roll(flat, shift):
        # Mosaic's sublane rotate is 32-bit only — round-trip narrow
        # dtypes through f32 (exact for bf16: widening casts are lossless
        # and the narrowing cast recovers the original values).
        if jnp.dtype(flat.dtype).itemsize < 4:
            return pltpu.roll(
                flat.astype(jnp.float32), shift, axis=0
            ).astype(flat.dtype)
        return pltpu.roll(flat, shift, axis=0)

    def triple(val, cin):
        """Flatten (rows, wb, cin) -> (rows*wb, cin) (free: full-width
        rows are contiguous) and precompute the ±1-column rolls so every
        conv tap below is an 8-aligned row slice."""
        flat = val.reshape(-1, cin)
        n = flat.shape[0]
        # pltpu.roll requires a non-negative shift; n-1 ≡ -1 (mod n).
        return (roll(flat, 1), flat, roll(flat, n - 1))

    xv = xs[...]
    xt = triple(xv, channels)

    def conv(sources, w_refs, ho, cout):
        """One dense conv: output logical rows [-ho, tile_h+ho), full
        width. ``sources``: [(triple, r0)] where r0 is the source row of
        the tile's logical row 0 (= the source's own row halo). Returns
        an (out_rows*wb, cout) fp32 accumulator."""
        out_rows = tile_h + 2 * ho
        m = out_rows * wb
        acc = jnp.zeros((m, cout), jnp.float32)
        for (tr, r0), wr in zip(sources, w_refs):
            for dy in range(3):
                a = (r0 - ho + dy - 1) * wb
                for dx in range(3):
                    acc = acc + jnp.dot(
                        tr[dx][a : a + m], wr[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
        return acc

    def finish(acc, ho):
        """LeakyReLU + zero outside the image extent, back to a rolled
        triple for downstream convs."""
        out_rows = tile_h + 2 * ho
        msk = _inside_image_mask(ti, tj, tile_h, tile_w, ho, out_rows, wb, h, w)
        c = _leaky(acc).reshape(out_rows, wb, growth) * msk
        return triple(c.astype(xs.dtype), growth)

    c1 = finish(conv([(xt, PAD)], [w1], 4, growth), 4)
    c2 = finish(conv([(xt, PAD), (c1, 4)], [w2x, w2c1], 3, growth), 3)
    c3 = finish(conv([(xt, PAD), (c1, 4), (c2, 3)], [w3x, w3c1, w3c2], 2, growth), 2)
    c4 = finish(
        conv([(xt, PAD), (c1, 4), (c2, 3), (c3, 2)],
             [w4x, w4c1, w4c2, w4c3], 1, growth), 1)
    acc = conv([(xt, PAD), (c1, 4), (c2, 3), (c3, 2), (c4, 1)],
               [w5x, w5c1, w5c2, w5c3, w5c4], 0, channels)

    center = xv[PAD : PAD + tile_h, PAD : PAD + tile_w, :].astype(jnp.float32)
    c5 = acc.reshape(tile_h, wb, channels)[:, PAD : PAD + tile_w, :]
    out = center + residual_scale * c5
    out_ref[...] = out[None].astype(out_ref.dtype)


def fused_rdb(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    residual_scale: float = 0.2,
    tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One ResidualDenseBlock, fused.

    Args:
        x: (B, H, W, C) input (any float dtype; compute fp32 accumulate).
        weights: [w1..w5] HWIO kernels — w1: (3,3,C,G); w_i: (3,3,C+(i-1)G,G);
            w5: (3,3,C+4G,C). (The flax module's conv kernels, ref
            generator_rdb.py dense chain.)
        tile: spatial tile edge; default 64 for <=2-byte dtypes, 48 for
            fp32 (the rolled source triples + fp32 accumulator of a
            64x64 fp32 tile at C=256 overflow the VMEM value stack).
    """
    b, h, w, c = x.shape
    if tile is None:
        tile = 64 if jnp.dtype(x.dtype).itemsize <= 2 else 48
    # Mosaic is TPU-only; elsewhere (CPU tests, debugging) run the same
    # program through the Pallas interpreter.
    interpret = interpret or jax.default_backend() != "tpu"
    g = weights[0].shape[-1]
    tile_h = min(tile, h)
    # tile_w + 2*PAD is the DMA slice's sublane extent — Mosaic requires
    # it 8-aligned, so round tile_w up to a multiple of 8 (tile-alignment
    # padding below covers the overhang). tile_h has no such constraint.
    tile_w = min(tile, -(-w // 8) * 8)
    n_th = -(-h // tile_h)
    n_tw = -(-w // tile_w)
    pad_h = n_th * tile_h - h
    pad_w = n_tw * tile_w - w
    # pad: PAD zeros on all sides (zero apron reproduces the convs'
    # border padding; 8 instead of 5 for alignment) + tile-alignment pad.
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
    # The chain keeps the rolled source triples + fp32 accumulator live
    # in VMEM; the default 16 MiB scoped-vmem stack is too small at C=256
    # while the chip has 128 MiB VMEM — raise the kernel's limit instead
    # of shrinking tiles (smaller tiles raise halo read amplification).
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
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(x_in, w1, w2x, w2c1, w3x, w3c1, w3c2, w4x, w4c1, w4c2, w4c3,
      w5x, w5c1, w5c2, w5c3, w5c4)

    if pad_h or pad_w:
        out = out[:, :h, :w]
    return out

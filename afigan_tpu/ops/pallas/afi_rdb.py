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
  * every 3x3 conv is 9 shifted (M, Cin) x (Cin, Cout) MXU matmuls
    accumulating in fp32; concatenation is never round-tripped to HBM.
  * intermediates c1..c4 stay as SSA values in VMEM; the final residual
    add (x + 0.2 * c5) is fused into the store.

Layout design (v2 — what makes Mosaic compile fast AND avoids relayouts;
the v1 kernel sliced (oh, ow, Cin) windows with ow < buffer width, so
every one of its 135 patch reshapes forced a strided-copy relayout and
Mosaic took ~17 min per shape):

  * ALL tensors keep FULL buffer width Wb = tile_w + 16 (a multiple of 8
    when tile_w is), so `(rows, Wb, C) -> (rows*Wb, C)` flattens are
    free relabelings (rows are contiguous).
  * a 3x3 conv tap (dy, dx) over the flattened source is then a ROW
    slice at offset (r0 - ho + dy - 1)*Wb + (dx - 1). The row part is a
    multiple of Wb (8-aligned); the ±1 column shift is hoisted into TWO
    whole-array sublane `pltpu.roll`s per source, after which all tap
    slices are 8-aligned and copy-free.
  * convs are computed at full width; the columns that wrap across row
    boundaries produce garbage only in the apron columns, which the
    shrinking-halo bookkeeping guarantees are never read by any valid
    output position, and the final store takes the aligned center
    `[:, 8:8+tile_w]` slice.

MXU-width packing (v3 — narrow matmuls were the remaining bottleneck:
G=32-channel operands use a quarter of the MXU's 128 lanes/sublanes):

  * the five x-side convs all read the same input, so their kernels are
    concatenated along OUT channels into one (3,3,C,4G+C) weight: ONE
    9-tap conv at the widest extent (halo 4) computes every x
    contribution at full MXU width; each stage row/lane-slices its part.
  * c1..c_{i-1} are packed along channels into a growing (halo-4 frame,
    Wb, (i-1)G) buffer, so each stage's dense-concat matmul has
    K = 32/64/96/128 instead of four separate K=32 ops — and only ONE
    rolled triple per stage instead of one per source.

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


def _rdb_kernel(x_hbm, wx, wc2, wc3, wc4, wc5,
                out_ref, xs, dma_sem,
                *, tile_h, tile_w, channels, growth, h, w, residual_scale):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    wb = tile_w + 2 * PAD
    g = growth
    f32 = jnp.float32

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
                flat.astype(f32), shift, axis=0
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

    def conv(tr, base, wr, m, acc):
        """9-tap conv: Σ_(dy,dx) patch(dy,dx) @ wr[dy,dx] into fp32 acc.
        ``base``: source row of the output's logical row 0 minus the
        output halo (so tap rows are base + dy - 1)."""
        for dy in range(3):
            a = (base + dy - 1) * wb
            for dx in range(3):
                acc = acc + jnp.dot(
                    tr[dx][a : a + m], wr[dy, dx],
                    preferred_element_type=f32,
                )
        return acc

    xv = xs[...]
    xt = triple(xv, channels)

    # ---- all five x-side convs as ONE wide conv (N = 4G + C) at the
    # widest extent (halo 4) ----
    rows1 = tile_h + 8
    m1 = rows1 * wb
    nx = 4 * g + channels
    xc = conv(xt, PAD - 4, wx, m1, jnp.zeros((m1, nx), f32))

    def xc_part(i, ho, m):
        """Stage i's x contribution: row-slice to its (halo ho) extent
        (8-aligned: a multiple of wb) + lane-slice to its out channels."""
        base = (4 - ho) * wb
        n0 = (i - 1) * g
        n1 = n0 + (g if i < 5 else channels)
        return xc[base : base + m, n0:n1]

    def finish(acc, ho):
        """LeakyReLU + zero outside the image extent, then zero-pad rows
        back to the shared halo-4 frame so stages pack channel-wise."""
        out_rows = tile_h + 2 * ho
        msk = _inside_image_mask(ti, tj, tile_h, tile_w, ho, out_rows, wb, h, w)
        c = _leaky(acc).reshape(out_rows, wb, g) * msk
        pad = 4 - ho
        if pad:
            c = jnp.pad(c, ((pad, pad), (0, 0), (0, 0)))
        return c.astype(xs.dtype)

    # conv1 = x-part only; its halo-4 extent IS the frame.
    pack = finish(xc_part(1, 4, m1), 4)
    for i, wc in ((2, wc2), (3, wc3), (4, wc4)):
        ho = 5 - i
        m = (tile_h + 2 * ho) * wb
        pt = triple(pack, pack.shape[-1])
        acc = conv(pt, 4 - ho, wc, m, xc_part(i, ho, m))
        pack = jnp.concatenate([pack, finish(acc, ho)], axis=-1)

    m0 = tile_h * wb
    pt = triple(pack, pack.shape[-1])
    acc = conv(pt, 4, wc5, m0, xc_part(5, 0, m0))

    center = xv[PAD : PAD + tile_h, PAD : PAD + tile_w, :].astype(f32)
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
    # MXU-width packing: cat(x, c1..ci) @ W == x @ W[:c] + pack @ W[c:],
    # with the five x-side segments further concatenated along OUT
    # channels (they share the input) into one (3,3,C,4G+C) kernel.
    wx = jnp.concatenate(
        [weights[0]] + [wt[:, :, :c] for wt in weights[1:]], axis=-1
    ).astype(dtype)
    wc2 = weights[1][:, :, c:].astype(dtype)  # (3,3,G,G)
    wc3 = weights[2][:, :, c:].astype(dtype)  # (3,3,2G,G)
    wc4 = weights[3][:, :, c:].astype(dtype)  # (3,3,3G,G)
    wc5 = weights[4][:, :, c:].astype(dtype)  # (3,3,4G,C)

    kernel = functools.partial(
        _rdb_kernel, tile_h=tile_h, tile_w=tile_w, channels=c, growth=g,
        h=h, w=w, residual_scale=residual_scale,  # TRUE extents (masks)
    )

    vmem = pltpu.VMEM
    # The chain keeps the rolled source triples + fp32 accumulators live
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
            *[pl.BlockSpec(memory_space=vmem) for _ in range(5)],
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
    )(x_in, wx, wc2, wc3, wc4, wc5)

    if pad_h or pad_w:
        out = out[:, :h, :w]
    return out

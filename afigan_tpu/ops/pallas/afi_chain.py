"""Fused AFI-generator chain — head conv + 3 RDBs + RiR residual in ONE
Pallas kernel.

Round-2 shipped the generator as FOUR custom calls (3x fused_rdb +
fused_upsample); each call is an XLA fusion boundary and the composed
model measured ~4% slower than the unfused XLA path despite 3-25x
op-level kernel wins. This kernel collapses the pre-upsample chain

    r = RiR(head) = head + 0.2 * (RDB3 ∘ RDB2 ∘ RDB1)(head),
    head = LReLU(conv3x3(x) + b)

into one VMEM-resident pass (16 chained 3x3 convs per tile), so the
whole generator is TWO custom calls: chain + fused_upsample
(mid→ConvTranspose→tail→+skip). Matches models/afi/generator.py /
ref generator_rdb.py:33-130 numerics exactly (LeakyReLU 0.2, residual
scale 0.2, zero-padding per conv).

Layout discipline is afi_rdb.py v2 (see its docstring): full-width
buffers (wb = tile_w + 2*PAD), free (rows, wb, C)->(rows*wb, C)
flattens, ±1-column conv taps as two whole-buffer sublane rolls, and
MXU-width packing (the five x-side convs of each RDB issued as one
(3,3,C,4G+C) conv; dense stages pack c1..c_{i-1} channel-wise).

PAD = 16 here because the chain is 16 convs deep before the output: the
column-edge garbage that the rolls wrap in advances one column per conv,
so a 16-column apron is exactly what keeps the center slice clean; rows
use explicit shrinking-halo bookkeeping (head halo 15 → RDB outputs at
halo 10/5/0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .afi_rdb import _leaky

PAD = 16  # column apron = conv depth of the chain (head + 15 RDB convs)


def _mask(ti, tj, tile_h, tile_w, row_halo, wb, h, w):
    """(rows, wb, 1) f32: 1 inside the true (h, w) plane. Reproduces the
    per-conv zero padding: every intermediate must read as zero outside
    the plane. Columns span the full apron [-PAD, tile_w + PAD)."""
    rows_n = tile_h + 2 * row_halo
    row0 = ti * tile_h - row_halo
    col0 = tj * tile_w - PAD
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, wb), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows_n, wb), 1) + col0
    ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return ok.astype(jnp.float32)[..., None]


def _chain_kernel(x_hbm, wh, bh,
                  w1x, w1c2, w1c3, w1c4, w1c5,
                  w2x, w2c2, w2c3, w2c4, w2c5,
                  w3x, w3c2, w3c3, w3c4, w3c5,
                  out_ref, xs, dma_sem,
                  *, tile_h, tile_w, channels, growth, h, w, residual_scale):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    wb = tile_w + 2 * PAD
    g = growth
    c = channels
    f32 = jnp.float32

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
        # Mosaic's sublane rotate is 32-bit only — round-trip bf16
        # through f32 (lossless both ways).
        if jnp.dtype(flat.dtype).itemsize < 4:
            return pltpu.roll(
                flat.astype(f32), shift, axis=0
            ).astype(flat.dtype)
        return pltpu.roll(flat, shift, axis=0)

    def triple(val, cin):
        flat = val.reshape(-1, cin)
        n = flat.shape[0]
        return (roll(flat, 1), flat, roll(flat, n - 1))

    def conv(tr, base, wr, m, acc):
        """9-tap conv: ``base`` = source apron − output halo (row units).
        Taps are 8-aligned row slices of the pre-rolled flattened source."""
        for dy in range(3):
            a = (base + dy - 1) * wb
            for dx in range(3):
                acc = acc + jnp.dot(
                    tr[dx][a : a + m], wr[dy, dx],
                    preferred_element_type=f32,
                )
        return acc

    dtype = xs.dtype
    xt = triple(xs[...], c)

    # ---- head = LReLU(conv(x) + b), halo 15 ----
    a_head = 15
    rows_h = tile_h + 2 * a_head
    m_h = rows_h * wb
    acc = conv(xt, PAD - a_head, wh, m_h, jnp.zeros((m_h, c), f32))
    acc = acc + bh[...].astype(f32)
    head = (
        _leaky(acc).reshape(rows_h, wb, c)
        * _mask(ti, tj, tile_h, tile_w, a_head, wb, h, w)
    ).astype(dtype)

    def rdb(src, a_in, wx, wc2, wc3, wc4, wc5):
        """One ResidualDenseBlock on a halo-``a_in`` frame; returns the
        residual-added output at halo ``a_in − 5``."""
        st = triple(src, c)
        ho1 = a_in - 1                     # stage-1..4 shared frame halo
        m1 = (tile_h + 2 * ho1) * wb
        nx = 4 * g + c
        xc = conv(st, a_in - ho1, wx, m1, jnp.zeros((m1, nx), f32))

        def xc_part(i, ho, m):
            base = (ho1 - ho) * wb
            n0 = (i - 1) * g
            n1 = n0 + (g if i < 5 else c)
            return xc[base : base + m, n0:n1]

        def finish(acc, ho):
            rows_n = tile_h + 2 * ho
            cc = (
                _leaky(acc).reshape(rows_n, wb, g)
                * _mask(ti, tj, tile_h, tile_w, ho, wb, h, w)
            )
            pad = ho1 - ho
            if pad:
                cc = jnp.pad(cc, ((pad, pad), (0, 0), (0, 0)))
            return cc.astype(dtype)

        pack = finish(xc_part(1, ho1, m1), ho1)
        for i, wc in ((2, wc2), (3, wc3), (4, wc4)):
            ho = a_in - i
            m = (tile_h + 2 * ho) * wb
            pt = triple(pack, pack.shape[-1])
            acc_i = conv(pt, ho1 - ho, wc, m, xc_part(i, ho, m))
            pack = jnp.concatenate([pack, finish(acc_i, ho)], axis=-1)

        ho5 = a_in - 5
        rows5 = tile_h + 2 * ho5
        m5 = rows5 * wb
        pt = triple(pack, pack.shape[-1])
        c5 = conv(pt, ho1 - ho5, wc5, m5, xc_part(5, ho5, m5))
        src_c = jax.lax.slice_in_dim(src, 5, 5 + rows5, axis=0).astype(f32)
        out = src_c + residual_scale * c5.reshape(rows5, wb, c)
        # Mask the sum: outside the plane the NEXT block must read zero
        # (src is already masked, but c5's apron rows/cols are garbage).
        out = out * _mask(ti, tj, tile_h, tile_w, ho5, wb, h, w)
        return out.astype(dtype)

    r = rdb(head, 15, w1x, w1c2, w1c3, w1c4, w1c5)
    r = rdb(r, 10, w2x, w2c2, w2c3, w2c4, w2c5)
    r = rdb(r, 5, w3x, w3c2, w3c3, w3c4, w3c5)      # halo 0

    head_c = jax.lax.slice_in_dim(head, a_head, a_head + tile_h, axis=0)
    out = head_c.astype(f32) + residual_scale * r.astype(f32)
    out_ref[...] = out[:, PAD : PAD + tile_w, :][None].astype(out_ref.dtype)


def fused_generator_chain(
    x: jnp.ndarray,
    head_w: jnp.ndarray,
    head_b: jnp.ndarray,
    rdb_weights,  # [[w1..w5] x 3] HWIO kernels per ResidualDenseBlock
    residual_scale: float = 0.2,
    tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """head conv + RDB1..3 + RiR residual, one kernel.

    Args:
        x: (B, H, W, C) generator input.
        head_w: (3,3,C,C) HWIO; head_b: (C,).
        rdb_weights: 3 blocks x [w1..w5]; w1: (3,3,C,G); w_i:
            (3,3,C+(i-1)G,G); w5: (3,3,C+4G,C).

    Returns: (B, H, W, C) — the RiR output r (fused_upsample's input).
    """
    b, h, w, c = x.shape
    if tile is None:
        # live set ≈ 2 frames + 2 triples + one fp32 wide accumulator;
        # 48 keeps Mosaic's value stack within the raised VMEM limit at
        # C=256/bf16 (64 fits the arithmetic but spills the allocator).
        tile = 48 if jnp.dtype(x.dtype).itemsize <= 2 else 32
    interpret = interpret or jax.default_backend() != "tpu"
    g = rdb_weights[0][0].shape[-1]
    tile_h = min(tile, h)
    tile_w = min(tile, -(-w // 8) * 8)
    n_th = -(-h // tile_h)
    n_tw = -(-w // tile_w)
    pad_h = n_th * tile_h - h
    pad_w = n_tw * tile_w - w
    x_in = jnp.pad(
        x, ((0, 0), (PAD, PAD + pad_h), (PAD, PAD + pad_w), (0, 0))
    )
    hp, wp = h + pad_h, w + pad_w

    dtype = x.dtype

    def split(weights):
        wx = jnp.concatenate(
            [weights[0]] + [wt[:, :, :c] for wt in weights[1:]], axis=-1
        ).astype(dtype)
        return [wx] + [wt[:, :, c:].astype(dtype) for wt in weights[1:]]

    packed = [head_w.astype(dtype), head_b.reshape(1, c).astype(dtype)]
    for blk in rdb_weights:
        packed.extend(split(blk))

    kernel = functools.partial(
        _chain_kernel, tile_h=tile_h, tile_w=tile_w, channels=c, growth=g,
        h=h, w=w, residual_scale=residual_scale,
    )
    vmem = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(b, n_th, n_tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM, manual DMA
            *[pl.BlockSpec(memory_space=vmem) for _ in range(17)],
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_in, *packed)

    if pad_h or pad_w:
        out = out[:, :h, :w]
    return out

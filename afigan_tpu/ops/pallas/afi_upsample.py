"""Fused conv-upsample tail of the AF interpolator — Pallas TPU kernel.

Covers the generator's post-RiR chain in ONE VMEM-resident pass (ref
generator_rdb.py:123-130; the BASELINE.json north star's "conv-upsample"
half — the RDB chain half lives in afi_rdb.py):

    y = LReLU(mid_conv3x3(r))            # r: RiR output, (H, W, C)
    z = LReLU(ConvTranspose(k6, s2, p2)(y))   # (2H, 2W, C)
    o = tail_conv3x3(z) + bilinear_x2(x)      # x: generator input (skip)

Under XLA the three 2x-resolution tensors (z, o, skip) each round-trip
HBM; here everything between the two HBM tensors (r, x) and the output
stays in VMEM per spatial tile.

Design (same aligned-layout discipline as afi_rdb.py v2 — full-width
buffers, free flattens, ±1-column shifts as two sublane rolls):

  * the ConvTranspose is computed as 4 SUBPIXEL PHASES: for stride 2 /
    k=6 / p=2, output parity (dy, dx) is a dense 3x3-tap conv over y
    with the parity-selected flipped kernel (models/layers.py
    ConvTranspose._phase_decomposed math, verified by its torch-parity
    tests) — every tap is an MXU matmul, no zero-stuffed convolution.
  * the tail 3x3 conv at OUTPUT resolution mixes phases: output phase
    (dy, dx) reads the four z phases at row/col offsets in {-1, 0, +1}
    — again plain aligned taps on the phase buffers.
  * the bilinear x2 skip is two 2-tap separable filters per phase
    ((0.25, 0.75) / (0.75, 0.25)), elementwise on the DMA'd skip tile;
    the skip input is EDGE-padded so border taps clamp exactly like
    jax.image.resize(..., "linear").
  * the kernel emits the 4 phases as 4 outputs; the host interleaves
    with the same stack/reshape the unfused ConvTranspose uses (one
    fused XLA transpose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .afi_rdb import PAD, _inside_image_mask, _leaky


def _upsample_kernel(r_hbm, g_hbm, wmid, bmid, wp00, wp01, wp10, wp11, bup,
                     wtail, btail, o00, o01, o10, o11, rs, gs, sem_r, sem_g,
                     *, tile_h, tile_w, channels, h, w):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    wb = tile_w + 2 * PAD
    f32 = jnp.float32

    for hbm, scratch, sem in ((r_hbm, rs, sem_r), (g_hbm, gs, sem_g)):
        cp = pltpu.make_async_copy(
            hbm.at[
                bi,
                pl.ds(ti * tile_h, tile_h + 2 * PAD),
                pl.ds(tj * tile_w, tile_w + 2 * PAD),
                :,
            ],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()

    def roll(flat, shift):
        if jnp.dtype(flat.dtype).itemsize < 4:  # Mosaic rotate is 32-bit only
            return pltpu.roll(
                flat.astype(f32), shift, axis=0
            ).astype(flat.dtype)
        return pltpu.roll(flat, shift, axis=0)

    def triple(val, cin):
        flat = val.reshape(-1, cin)
        n = flat.shape[0]
        return (roll(flat, 1), flat, roll(flat, n - 1))

    def tap(tr, base, row_off, col_off, m):
        """(m, Cin) slice of a flattened source: logical output row 0
        maps to source row ``base``; col_off ∈ {-1, 0, 1} picks the
        pre-rolled copy so the slice itself is 8-aligned."""
        a = (base + row_off) * wb
        return tr[col_off + 1][a : a + m]

    rv = rs[...]
    rt = triple(rv, channels)

    # ---- y = LReLU(mid(r) + bmid), halo 2, full width ----
    y_rows = tile_h + 4
    m_y = y_rows * wb
    acc = jnp.zeros((m_y, channels), f32)
    for u in range(3):
        for v in range(3):
            acc = acc + jnp.dot(
                tap(rt, PAD - 2, u - 1, v - 1, m_y), wmid[u, v],
                preferred_element_type=f32,
            )
    acc = acc + bmid[...].astype(f32)
    y = _leaky(acc).reshape(y_rows, wb, channels)
    y = y * _inside_image_mask(ti, tj, tile_h, tile_w, 2, y_rows, wb, h, w)
    yt = triple(y.astype(rs.dtype), channels)

    # ---- z phases + tail, STREAMED: each z phase (a 3x3 parity-selected
    # conv over y, halo 1) is computed, immediately consumed into the 4
    # output-phase accumulators, and dropped — keeping all 4 z triples
    # live spilled the Mosaic register allocator (~120 MB) at fp32/48.
    z_rows = tile_h + 2
    m_z = z_rows * wb
    m_o = tile_h * wb
    zmask = _inside_image_mask(ti, tj, tile_h, tile_w, 1, z_rows, wb, h, w)
    # Output row 2i+d, tail tap u: z position 2i+d+u-1 = 2i' + d' with
    # (phase d', row offset i'-i) given by:
    tail_map = {0: [(1, -1), (0, 0), (1, 0)], 1: [(0, 0), (1, 0), (0, 1)]}
    out_phases = ((0, 0), (0, 1), (1, 0), (1, 1))
    oacc = {ph: jnp.zeros((m_o, channels), f32) for ph in out_phases}

    for (py, px), wph in (((0, 0), wp00), ((0, 1), wp01),
                          ((1, 0), wp10), ((1, 1), wp11)):
        acc = jnp.zeros((m_z, channels), f32)
        for u in range(3):
            for v in range(3):
                acc = acc + jnp.dot(
                    tap(yt, 2 - 1, u - 1, v - 1, m_z), wph[u, v],
                    preferred_element_type=f32,
                )
        acc = acc + bup[...].astype(f32)
        z = _leaky(acc).reshape(z_rows, wb, channels) * zmask
        ztr = triple(z.astype(rs.dtype), channels)
        for dy, dx in out_phases:
            for u, (py2, roff) in enumerate(tail_map[dy]):
                if py2 != py:
                    continue
                for v, (px2, coff) in enumerate(tail_map[dx]):
                    if px2 != px:
                        continue
                    oacc[(dy, dx)] = oacc[(dy, dx)] + jnp.dot(
                        tap(ztr, 1, roff, coff, m_o), wtail[u, v],
                        preferred_element_type=f32,
                    )

    # ---- + tail bias + bilinear x2 skip, per output phase ----
    # bilinear x2 half-pixel taps per output parity: row 2i: 0.25*g[i-1]
    # + 0.75*g[i]; row 2i+1: 0.75*g[i] + 0.25*g[i+1].
    skip_map = {0: [(-1, 0.25), (0, 0.75)], 1: [(0, 0.75), (1, 0.25)]}
    gt = triple(gs[...], channels)
    for (dy, dx), out_ref in zip(out_phases, (o00, o01, o10, o11)):
        acc = oacc[(dy, dx)] + btail[...].astype(f32)
        for roff, rwt in skip_map[dy]:
            for coff, cwt in skip_map[dx]:
                acc = acc + (rwt * cwt) * tap(gt, PAD, roff, coff, m_o).astype(f32)
        out = acc.reshape(tile_h, wb, channels)[:, PAD : PAD + tile_w, :]
        out_ref[...] = out[None].astype(out_ref.dtype)


def fused_upsample(
    r: jnp.ndarray,
    x: jnp.ndarray,
    wmid: jnp.ndarray,
    bmid: jnp.ndarray,
    wup: jnp.ndarray,
    bup: jnp.ndarray,
    wtail: jnp.ndarray,
    btail: jnp.ndarray,
    tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused mid→ConvTranspose→tail→(+bilinear skip): (B,H,W,C) → (B,2H,2W,C).

    Args:
        r: RiR output (mid conv input).
        x: generator input (bilinear-skip source), same shape as r.
        wmid/wtail: (3,3,C,C) HWIO kernels; wup: (6,6,C,C) HWIO
            ConvTranspose kernel (torch layout, flipped internally);
            b*: (C,) biases.
    """
    b, h, w, c = r.shape
    if tile is None:
        # one notch below afi_rdb's defaults: the streamed tail still
        # keeps ~2x the RDB chain's live values (y triple + z triple +
        # four fp32 output accumulators + skip triple)
        tile = 48 if jnp.dtype(r.dtype).itemsize <= 2 else 32
    # Mosaic is TPU-only; elsewhere (CPU tests, debugging) run the same
    # program through the Pallas interpreter.
    interpret = interpret or jax.default_backend() != "tpu"
    tile_h = min(tile, h)
    tile_w = min(tile, -(-w // 8) * 8)
    n_th = -(-h // tile_h)
    n_tw = -(-w // tile_w)
    pad_h = n_th * tile_h - h
    pad_w = n_tw * tile_w - w
    # r: zero apron (conv padding semantics); x: EDGE apron (bilinear
    # border clamp).
    r_in = jnp.pad(r, ((0, 0), (PAD, PAD + pad_h), (PAD, PAD + pad_w), (0, 0)))
    x_in = jnp.pad(
        x, ((0, 0), (PAD, PAD + pad_h), (PAD, PAD + pad_w), (0, 0)),
        mode="edge",
    )
    hp, wp = h + pad_h, w + pad_w

    dtype = r.dtype
    # parity-selected phase kernels (ConvTranspose._phase_decomposed
    # math: output index 2i+d reads taps m ≡ pp-d (mod 2), pp = k-1-p=3)
    wf = jnp.flip(wup, (0, 1))
    sel = {0: jnp.asarray([1, 3, 5]), 1: jnp.asarray([0, 2, 4])}
    wph = {
        (dy, dx): wf[sel[dy]][:, sel[dx]].astype(dtype)
        for dy in (0, 1) for dx in (0, 1)
    }

    kernel = functools.partial(
        _upsample_kernel, tile_h=tile_h, tile_w=tile_w, channels=c, h=h, w=w,
    )
    vmem = pltpu.VMEM
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    phase_shape = jax.ShapeDtypeStruct((b, hp, wp, c), dtype)
    phase_spec = pl.BlockSpec(
        (1, tile_h, tile_w, c), lambda bi, i, j: (bi, i, j, 0),
        memory_space=vmem,
    )
    p00, p01, p10, p11 = pl.pallas_call(
        kernel,
        grid=(b, n_th, n_tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # r in HBM, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM, manual DMA
            *[pl.BlockSpec(memory_space=vmem) for _ in range(9)],
        ],
        out_specs=(phase_spec,) * 4,
        out_shape=(phase_shape,) * 4,
        scratch_shapes=[
            vmem((tile_h + 2 * PAD, tile_w + 2 * PAD, c), dtype),
            vmem((tile_h + 2 * PAD, tile_w + 2 * PAD, c), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(r_in, x_in,
      wmid.astype(dtype), bmid.reshape(1, c).astype(dtype),
      wph[(0, 0)], wph[(0, 1)], wph[(1, 0)], wph[(1, 1)],
      bup.reshape(1, c).astype(dtype),
      wtail.astype(dtype), btail.reshape(1, c).astype(dtype))

    # interleave: out[2i+dy, 2j+dx] = phase[(dy,dx)][i, j] (same
    # stack/reshape as ConvTranspose._phase_decomposed)
    row0 = jnp.stack([p00, p01], axis=3)
    row1 = jnp.stack([p10, p11], axis=3)
    both = jnp.stack([row0, row1], axis=2)  # (B, hp, 2, wp, 2, C)
    out = both.reshape(b, 2 * hp, 2 * wp, c)
    if pad_h or pad_w:
        out = out[:, : 2 * h, : 2 * w]
    return out

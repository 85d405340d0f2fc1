"""Per-ROI window extraction — Pallas DMA kernel.

The windowed ROIAlign pooler (ops/roi_align.py) slices one
(window, window, C) region per ROI out of the row-concatenated pyramid
tensor. Under XLA that vmapped `dynamic_slice` lowers to a scalar-indexed
gather that measures ~50x slower than the raw HBM traffic on v5e — the
pooler's dominant phase. This kernel replaces it with one hardware DMA
per ROI (HBM -> HBM, no compute): the window starts are scalar-prefetched
so each grid step issues its copy immediately.

Alignment contract: `window` must be a multiple of 8 and the COLUMN
starts must be 8-aligned (sublane tiling). The pooler guarantees both by
rounding starts down to multiples of 8 and sizing the window with +8
slack (interpolation weights are computed relative to the rounded start,
so the math is unchanged; see roi_align.py win_start).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(starts_ref, concat_ref, out_ref, sem, *, window):
    r = pl.program_id(0)
    row = starts_ref[r, 0]
    # starts carry col/8: multiplying back by 8 in-kernel lets Mosaic
    # PROVE the sublane-dim slice offset is tile-aligned (a raw runtime
    # value, even if always a multiple of 8, fails its divisibility check)
    col = starts_ref[r, 1] * 8
    cp = pltpu.make_async_copy(
        concat_ref.at[pl.ds(row, window), pl.ds(col, window), :],
        out_ref.at[r],
        sem,
    )
    cp.start()
    cp.wait()


def gather_windows(
    concat: jnp.ndarray,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    window: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(sumH, Wmax, C) + per-ROI (row, col) starts -> (R, window, window, C).

    Identical to ``vmap(lambda r, c: dynamic_slice(concat, (r, c, 0),
    (window, window, C)))`` — used on TPU where that gather is slow; the
    vmap fallback runs elsewhere.
    """
    r = rows.shape[0]
    c = concat.shape[-1]
    if (not interpret and jax.default_backend() != "tpu") or r == 0:
        return jax.vmap(
            lambda r0, c0: jax.lax.dynamic_slice(
                concat, (r0, c0, 0), (window, window, c)
            )
        )(rows, cols)
    starts = jnp.stack([rows, cols // 8], axis=-1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, window, window, c), concat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts, concat)

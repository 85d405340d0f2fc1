"""Fused ROIAlign window-pool — Pallas DMA + MXU kernel.

Replaces the pooler's window gather + interpolation einsums with ONE
kernel. The XLA lowering of the vmapped ``dynamic_slice`` window gather
materializes a (N*win, Wmax, C) row-gather intermediate (33.8 GB at
box-branch scale — measured via benchmarks/profile_gather.py, where it
OOMs standalone) and serializes; this kernel instead streams exactly one
(win_r, win_c, C) window per ROI from HBM into a double-buffered VMEM
scratch and contracts it with the per-ROI interpolation matrices on the
MXU while the next ROI's window is in flight:

    out[n, p, q, :] = ry[n] @ window[n] @ rx[n]^T        (f32 accum)

HBM traffic is the theoretical floor (each window element read once,
(P, P, C) written once) and the DMA engine overlaps the matmuls.

Alignment contract (same as window_gather.py, learned the hard way):
  * the COLUMN start must be 8-aligned — callers pass ``col // 8`` and
    the kernel multiplies back so Mosaic can PROVE tile alignment;
  * the concat tensor arrives with its (W, C) dims pre-merged to
    (totalH, Wmax*C) so the DMA and the row-contraction need no
    in-kernel minor-dim reshape (col*8*C offsets are 1024-multiples).

Replaces detectron2 v0.1.1 ROIAlign CUDA (SURVEY §2.3); numerics match
ops/roi_align.py's windowed formulation (see its docstring for the d2
border-handling proof).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_kernel(rows_ref, cols_ref, ry_ref, rx_ref, concat_ref, out_ref,
                 win_scratch, sems, *, win_r, win_c, p, c):
    n = pl.program_id(0)
    num = pl.num_programs(0)
    slot = jax.lax.rem(n, 2)
    nslot = jax.lax.rem(n + 1, 2)

    def window_copy(i, sl):
        # starts carry row/8 and col/8: multiplying back in-kernel lets
        # Mosaic PROVE both slice offsets are tile-aligned (rows are the
        # sublane dim of the merged (totalH, Wmax*C) layout). Two 1-D
        # scalar-prefetch arrays: a 2-D (N, 2) SMEM operand is padded to
        # 128 lanes and blows the 1 MiB SMEM budget at N=4096.
        row8 = rows_ref[i]
        col8 = cols_ref[i]
        return pltpu.make_async_copy(
            concat_ref.at[pl.ds(row8 * 8, win_r), pl.ds(col8 * (8 * c), win_c * c)],
            win_scratch.at[sl],
            sems.at[sl],
        )

    @pl.when(n == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(n + 1 < num)
    def _():
        window_copy(n + 1, nslot).start()

    window_copy(n, slot).wait()

    win2 = win_scratch[slot]                       # (win_r, win_c*C)
    t = jnp.dot(ry_ref[0], win2, preferred_element_type=jnp.float32)
    t_all = t.reshape(p * win_c, c)                # contiguity-preserving
    b = rx_ref[0].astype(jnp.float32)              # (P, win_c)
    for pp in range(p):
        out_ref[0, pp] = jnp.dot(
            b, t_all[pp * win_c:(pp + 1) * win_c, :],
            preferred_element_type=jnp.float32,
        )


def fused_window_pool(
    concat2: jnp.ndarray,
    rows8: jnp.ndarray,
    cols8: jnp.ndarray,
    ry: jnp.ndarray,
    rx: jnp.ndarray,
    win_r: int,
    win_c: int,
    channels: int,
    interpret: bool = False,
    vmem_limit: int | None = None,
) -> jnp.ndarray:
    """Pool N ROIs in one pipelined kernel.

    Args:
        concat2: (totalH, Wmax*C) row-concatenated (and batch-concatenated)
            pyramid with the (W, C) dims merged.
        rows8, cols8: (N,) int32 — row_start // 8 and col_start // 8.
        ry: (N, P, win_r) row-interpolation matrices (feature dtype).
        rx: (N, P, win_c) column-interpolation matrices.
        win_r, win_c: window extent; BOTH starts are 8-aligned and both
            extents carry +8 slack absorbing the round-down.
        channels: C (concat2's minor dim is Wmax*C).

    Returns: (N, P, P, C) float32.
    """
    n, p, _ = ry.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, win_r), lambda i, r_, c_: (i, 0, 0)),
            pl.BlockSpec((1, p, win_c), lambda i, r_, c_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, p, p, channels), lambda i, r_, c_: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_r, win_c * channels), concat2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bytes_win = win_r * win_c * channels * concat2.dtype.itemsize
    return pl.pallas_call(
        functools.partial(
            _pool_kernel, win_r=win_r, win_c=win_c, p=p, c=channels
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, channels), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p * win_r * win_c * channels
            + 2 * n * p * p * win_c * channels,
            bytes_accessed=n * (bytes_win + p * p * channels * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows8, cols8, ry, rx, concat2)

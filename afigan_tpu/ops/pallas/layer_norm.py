"""Fused LayerNorm over the channel (minor) axis: one read, one write.

Why: the flagship device trace (Cascade Swin-L BiFPN, 896x1408 batch 4,
2026-08-20) shows Swin's LayerNorms costing ~40 ms/step in
`convert_reduce` stat fusions alone (plus the apply fusions) — the XLA
lowering converts the bf16 input to f32, runs a two-output
(sum, sum-of-squares) reduce over the minor axis, materializes f32
stats planes in HBM, then re-reads the input for the normalize apply.
Measured effective bandwidth ~94 GB/s (~12% of chip peak). This kernel
computes stats and applies the normalization in one VMEM pass per row
block: HBM traffic drops to read-x + write-y.

Numerics match `flax.linen.LayerNorm(use_fast_variance=True)` in f32:
mean and E[x^2] in f32, var = max(0, E[x^2] - mean^2),
y = (x - mean) * (rsqrt(var + eps) * scale) + bias.

Forward-only (inference path); training uses the identical jnp math
inline (`models/swin.py::FusedLayerNorm`), which autodiff handles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps, out_dtype):
    x = x_ref[:].astype(jnp.float32)  # (RB, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    mul = jax.lax.rsqrt(var + eps) * scale_ref[:].astype(jnp.float32)
    y = (x - mean) * mul + bias_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "out_dtype", "interpret"))
def fused_layer_norm(x, scale, bias, *, eps: float = 1e-5, out_dtype=None,
                     interpret: bool = False):
    """LayerNorm over the last axis of x.

    Args:
      x: (..., C) any dtype (stats in f32).
      scale, bias: (C,) parameters.
      out_dtype: output dtype (defaults to x.dtype).

    Returns: (..., C) normalized, in out_dtype.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    orig_shape = x.shape
    c = orig_shape[-1]
    r = 1
    for s in orig_shape[:-1]:
        r *= s
    xr = x.reshape(r, c)
    # Row blocks: big enough to amortize the grid, divisor of R so no
    # masking is needed (R = B*H*W; H and W are multiples of small
    # powers of two at every pyramid level, so a large divisor exists).
    # If R is awkward (prime/odd) the largest divisor can degenerate to
    # a tiny block = an R-step grid; LayerNorm is row-independent, so
    # instead pad with zero rows to a multiple of 512 and slice the
    # result (zero rows normalize to bias, then get dropped) —
    # round-3 ADVICE #2.
    rb = _largest_divisor(r, 1024)
    r_padded = r
    if rb < 64 and r >= 64:
        r_padded = -(-r // 512) * 512
        xr = jnp.pad(xr, ((0, r_padded - r), (0, 0)))
        rb = 512
    grid = (r_padded // rb,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_padded, c), out_dtype),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    if r_padded != r:
        out = out[:r]
    return out.reshape(orig_shape)

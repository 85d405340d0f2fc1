"""Fused Swin window attention: QK^T -> +bias/mask -> softmax -> .V in VMEM.

Why this kernel exists (measured, flagship Cascade Swin-L BiFPN trace,
896x1408 batch 4, 2026-08-20): the XLA lowering of window attention
materializes the (num_windows, heads, N, N) f32 score tensor in HBM
three times per block — the exp fusion writes ~1.1 GB (Swin stage 1:
2280 windows x 6 heads x 144 x 144 f32), the softmax-denominator
reduce re-reads it, and the attention.V fusion re-reads it again. At
~60 ms/step across the 24 Swin-L blocks this was the single largest
cost category of the flagship inference step, and it is pure HBM
bandwidth: each (N, N) = (144, 144) score tile is only ~83 KB and fits
in VMEM trivially.

This kernel computes the whole attention for a block of windows
without ever writing scores to HBM: per (window, head) it contracts
q.k^T on the MXU into an f32 VMEM tile, adds the relative-position
bias (and the SW-MSA shift mask when present), runs the max-subtracted
softmax on the VPU, and contracts the probabilities with v back on the
MXU. HBM traffic drops from ~5 GB/step of score round-trips to just
the qkv/output tiles (~0.5 GB).

Precision note: the XLA path computes the score einsum in the model
dtype (bf16 in production) and upcasts for softmax, i.e. scores are
rounded to bf16 once; this kernel keeps scores in f32 end-to-end
(`preferred_element_type=jnp.float32`), which is slightly MORE
accurate. Probabilities are cast back to the model dtype for the .V
matmul, matching the XLA path.

Forward-only: the generator of this op (`models/swin.py
WindowAttention`) gates it to inference — training keeps the XLA path
(which autodiff handles natively).

Reference semantics: window attention with relative position bias per
/root/reference/afigan/modeling/backbone/swin_transformer.py:80-158.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                 wb: int, nh: int, scale: float, out_dtype):
    """One grid step: WB windows x NH heads of (N, D) attention.

    q/k/v_ref: (WB, NH, N, D); bias_ref: (NH, N, N) f32;
    mask_ref: (WB, N, N) f32 or None; out_ref: (WB, NH, N, D).
    """
    for w in range(wb):
        m = mask_ref[w] if mask_ref is not None else None
        for h in range(nh):
            q = q_ref[w, h]  # (N, D) model dtype
            k = k_ref[w, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (N, N) f32
            s = s + bias_ref[h]
            if m is not None:
                s = s + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(out_dtype), v_ref[w, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[w, h] = o.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_window_attention(q, k, v, bias, mask=None, *, scale: float,
                           interpret: bool = False):
    """Fused window attention.

    Args:
      q, k, v: (BNW, NH, N, D) in the model dtype (bf16 in production).
      bias: (NH, N, N) relative-position bias, f32.
      mask: optional (NW, N, N) f32 SW-MSA additive mask, where NW
        divides BNW and window i uses mask[i % NW] (the batched-window
        layout produced by `window_partition`).
      scale: q scaling (head_dim ** -0.5), applied to the f32 scores.

    Returns: (BNW, NH, N, D) in q.dtype.
    """
    bnw, nh, n, d = q.shape
    assert k.shape == q.shape and v.shape == q.shape
    assert bias.shape == (nh, n, n), (bias.shape, (nh, n, n))
    interpret = interpret or jax.default_backend() != "tpu"
    out_dtype = q.dtype

    # Block WB windows per grid step, bounded so the unrolled WB*NH
    # head loop stays compilable; with a mask, WB must divide NW so a
    # block of consecutive windows shares one contiguous mask chunk.
    unroll_cap = 48
    wb_cap = max(1, min(8, unroll_cap // nh))
    if mask is not None:
        nw = mask.shape[0]
        assert mask.shape == (nw, n, n)
        assert bnw % nw == 0, (bnw, nw)
        wb = _largest_divisor(nw, wb_cap)
        grid = (bnw // nw, nw // wb)

        def qkv_index(ib, iw):
            return (ib * (nw // wb) + iw, 0, 0, 0)

        mask_spec = pl.BlockSpec((wb, n, n), lambda ib, iw: (iw, 0, 0))
        bias_index = lambda ib, iw: (0, 0, 0)  # noqa: E731
    else:
        wb = _largest_divisor(bnw, wb_cap)
        grid = (bnw // wb,)

        def qkv_index(i):
            return (i, 0, 0, 0)

        mask_spec = None
        bias_index = lambda i: (0, 0, 0)  # noqa: E731

    qkv_spec = pl.BlockSpec((wb, nh, n, d), qkv_index)
    in_specs = [qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((nh, n, n), bias_index)]
    operands = [q, k, v, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(mask_spec)
        operands.append(mask.astype(jnp.float32))

    kernel = functools.partial(
        _attn_kernel if mask is not None else _nomask_kernel,
        wb=wb, nh=nh, scale=scale, out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bnw, nh, n, d), out_dtype),
        interpret=interpret,
    )(*operands)


def _nomask_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                   wb: int, nh: int, scale: float, out_dtype):
    _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref,
                 wb=wb, nh=nh, scale=scale, out_dtype=out_dtype)

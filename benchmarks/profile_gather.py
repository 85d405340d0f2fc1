"""Window-gather lowering shoot-out for the ROIAlign pooler.

The mask sub-ladder showed the pooler's vmap(dynamic_slice) window gather
runs ~1 s standalone for 1024 (48,48,256) windows — latency-serialized
DMAs. Compare lowering strategies for the same access pattern at
box-branch scale (B=8, R=512/img, window 48, concat (398,336,256) bf16):

  slice    vmap(dynamic_slice) per ROI           (current)
  index2d  concat[rows[:,:,None], cols[:,None,:]] one advanced-index op
  rowcol   row gather (take) -> column take_along_axis
  densemm  interpolation-matrix contraction, NO gather (two matmuls,
           blocked over R) — the all-MXU reformulation
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import chained_timed

import numpy as np
import jax
import jax.numpy as jnp

B, R, WIN, C, P = 8, 512, 48, 256, 7
SUMH, WMAX = 398, 336
DT = jnp.bfloat16


def timed(name, fn, state):
    return chained_timed(name, fn, state, label_width=8)


def main():
    rng = np.random.RandomState(0)
    concat = jnp.asarray(rng.rand(B, SUMH, WMAX, C).astype(np.float32), DT)
    wy = jnp.asarray(rng.randint(0, SUMH - WIN, (B, R)), jnp.int32)
    wx = jnp.asarray(rng.randint(0, WMAX - WIN, (B, R)), jnp.int32)
    ry = jnp.asarray(rng.rand(B, R, P, WIN).astype(np.float32), DT)
    rx = jnp.asarray(rng.rand(B, R, P, WIN).astype(np.float32), DT)

    def chain(out, x):
        s = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(DT)
        return x + s

    # 1. current: vmap(dynamic_slice) + window matmuls
    @jax.jit
    def f_slice(x):
        def per_img(cc, yy, xx, a, b):
            win = jax.vmap(
                lambda y0, x0: jax.lax.dynamic_slice(cc, (y0, x0, 0), (WIN, WIN, C))
            )(yy, xx)
            tmp = jnp.einsum("rpk,rkwc->rpwc", a, win,
                             preferred_element_type=jnp.float32).astype(DT)
            return jnp.einsum("rqw,rpwc->rpqc", b, tmp,
                              preferred_element_type=jnp.float32)
        out = jax.vmap(per_img)(x, wy, wx, ry, rx)
        return chain(out, x)

    timed("slice", f_slice, concat)

    # 2. one advanced-index gather
    @jax.jit
    def f_index2d(x):
        def per_img(cc, yy, xx, a, b):
            rows = yy[:, None] + jnp.arange(WIN)[None, :]  # (R, WIN)
            cols = xx[:, None] + jnp.arange(WIN)[None, :]
            win = cc[rows[:, :, None], cols[:, None, :]]  # (R, WIN, WIN, C)
            tmp = jnp.einsum("rpk,rkwc->rpwc", a, win,
                             preferred_element_type=jnp.float32).astype(DT)
            return jnp.einsum("rqw,rpwc->rpqc", b, tmp,
                              preferred_element_type=jnp.float32)
        out = jax.vmap(per_img)(x, wy, wx, ry, rx)
        return chain(out, x)

    timed("index2d", f_index2d, concat)

    # 3. row gather then column take_along_axis
    @jax.jit
    def f_rowcol(x):
        def per_img(cc, yy, xx, a, b):
            rows = yy[:, None] + jnp.arange(WIN)[None, :]
            got = cc[rows.reshape(-1)].reshape(R, WIN, WMAX, C)
            cols = xx[:, None] + jnp.arange(WIN)[None, :]
            win = jnp.take_along_axis(got, cols[:, None, :, None], axis=2)
            tmp = jnp.einsum("rpk,rkwc->rpwc", a, win,
                             preferred_element_type=jnp.float32).astype(DT)
            return jnp.einsum("rqw,rpwc->rpqc", b, tmp,
                              preferred_element_type=jnp.float32)
        out = jax.vmap(per_img)(x, wy, wx, ry, rx)
        return chain(out, x)

    timed("rowcol", f_rowcol, concat)

    # 4. dense interpolation-matrix contraction (no gather at all):
    #    Ry_full (R, P, SUMH) / Rx_full (R, P, WMAX) sparse-as-dense,
    #    blocked over R to bound the (chunk, P, WMAX, C) intermediate.
    ry_full = jnp.zeros((B, R, P, SUMH), DT)
    rx_full = jnp.zeros((B, R, P, WMAX), DT)
    # scatter the window-support weights into the full matrices (host side)
    ry_np = np.zeros((B, R, P, SUMH), np.float32)
    rx_np = np.zeros((B, R, P, WMAX), np.float32)
    wy_np, wx_np = np.asarray(wy), np.asarray(wx)
    ry_src, rx_src = np.asarray(ry, np.float32), np.asarray(rx, np.float32)
    for i in range(B):
        for r_ in range(R):
            ry_np[i, r_, :, wy_np[i, r_]:wy_np[i, r_] + WIN] = ry_src[i, r_]
            rx_np[i, r_, :, wx_np[i, r_]:wx_np[i, r_] + WIN] = rx_src[i, r_]
    ry_full = jnp.asarray(ry_np, DT)
    rx_full = jnp.asarray(rx_np, DT)
    CHUNK = 128

    @jax.jit
    def f_densemm(x):
        def per_img(cc, a_full, b_full):
            flat = cc.reshape(SUMH, WMAX * C)

            def do_chunk(carry, ab):
                a, b = ab  # (CHUNK, P, SUMH), (CHUNK, P, WMAX)
                tmp = (a.reshape(CHUNK * P, SUMH) @ flat).reshape(
                    CHUNK, P, WMAX, C)
                out = jnp.einsum("rqw,rpwc->rpqc", b, tmp.astype(DT),
                                 preferred_element_type=jnp.float32)
                return carry, out

            _, outs = jax.lax.scan(
                do_chunk, 0,
                (a_full.reshape(R // CHUNK, CHUNK, P, SUMH),
                 b_full.reshape(R // CHUNK, CHUNK, P, WMAX)),
            )
            return outs
        out = jax.vmap(per_img)(x, ry_full, rx_full)
        return chain(out, x)

    timed("densemm", f_densemm, concat)


if __name__ == "__main__":
    main()

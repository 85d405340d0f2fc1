"""Pooler A/B: "fast" (windowed matmul + point-scatter bwd) vs "pallas"
(fused window-DMA kernel + dense-matmul bwd) at production scales.

Box branch: B=8, R=512, P=7.  Mask branch: B=8, R=128, P=14.
Features: 800x1344 bf16 pyramid. Chained timing (the only honest timing
on the axon backend), best of BENCH_REPEATS.

Run ALONE on the chip: `python benchmarks/profile_pool.py`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import chained_timed

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.ops.roi_align import (
    multilevel_roi_align_fast,
    multilevel_roi_align_pallas,
)

B, C = 8, 256
H, W = 800, 1344
DT = jnp.bfloat16
STRIDES = (4, 8, 16, 32)


def make_inputs(r):
    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.rand(B, H // s, W // s, C).astype(np.float32), DT)
        for s in STRIDES
    )
    boxes = np.zeros((B, r, 4), np.float32)
    xy = rng.rand(B, r, 2) * [W - 200, H - 200]
    wh = rng.rand(B, r, 2) * 180 + 20
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    return feats, jnp.asarray(boxes)


def timed(name, fn, state):
    return chained_timed(name, fn, state, label_width=22)


def pool_fast(fs, boxes, p):
    return jax.vmap(lambda *a: multilevel_roi_align_fast(
        tuple(a[:-1]), a[-1], STRIDES, p, 2, True))(*fs, boxes)


def pool_pallas(fs, boxes, p):
    return multilevel_roi_align_pallas(tuple(fs), boxes, STRIDES, p, 2, True)


def bench_scale(tag, r, p):
    feats, boxes = make_inputs(r)
    impls = os.environ.get("PROF_IMPL", "pallas,fast").split(",")
    for impl_name, pool in (("pallas", pool_pallas), ("fast", pool_fast)):
        if impl_name not in impls:
            continue
        @jax.jit
        def fwd(fs, pool=pool):
            out = pool(fs, boxes, p)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return tuple(f + s.astype(DT) for f in fs)

        timed(f"{tag}/{impl_name}/fwd", fwd, feats)

        @jax.jit
        def fwdbwd(fs, pool=pool):
            g = jax.grad(
                lambda f: jnp.sum(pool(f, boxes, p).astype(jnp.float32)) * 1e-12
            )(fs)
            return tuple(f + gg.astype(DT) for f, gg in zip(fs, g))

        timed(f"{tag}/{impl_name}/fwdbwd", fwdbwd, feats)


def bench_isolation(tag, r, p):
    """Attribute the pallas pooler's time: kernel alone, prologue alone,
    overflow-correction alone, dense backward alone."""
    from afigan_tpu.ops.roi_align import (
        _pallas_axis_matrix,
        _pallas_concat2,
        _pallas_pool_bwd_dense,
        _pallas_pool_forward,
        _pallas_pool_geometry,
    )
    from afigan_tpu.ops.pallas.roi_pool import fused_window_pool

    feats, boxes = make_inputs(r)

    # no-overflow forward (kernel + prologue, no correction gather)
    @jax.jit
    def fwd_noof(fs):
        out = _pallas_pool_forward(
            list(fs), boxes, list(STRIDES), p, 2, True, 224.0, 4, 0, False)
        s = jnp.sum(out.astype(jnp.float32)) * 1e-12
        return tuple(f + s.astype(DT) for f in fs)

    timed(f"{tag}/noof/fwd", fwd_noof, feats)

    # kernel only: geometry precomputed once (eagerly — jit would turn
    # the static numpy layout fields into device arrays), chain concat2
    geo = _pallas_pool_geometry(
        list(feats), boxes, list(STRIDES), p, 2, True, 224.0, 4)
    ry, _ = _pallas_axis_matrix(geo["ys"], geo["lvl_h"], geo["wy"],
                                geo["win_r"], p, 2)
    rx, _ = _pallas_axis_matrix(geo["xs"], geo["lvl_w"], geo["wx"],
                                geo["win_c"], p, 2)
    ry, rx = ry.astype(DT), rx.astype(DT)
    concat2 = jax.jit(
        lambda fs: _pallas_concat2(list(fs), geo))(feats)
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), r)
    rows8 = ((img_idx * geo["sumh"] + geo["lvl_base"] + geo["wy"]) // 8
             ).astype(jnp.int32)
    cols8 = (geo["wx"] // 8).astype(jnp.int32)

    @jax.jit
    def kernel_only(c2):
        out = fused_window_pool(c2, rows8, cols8, ry, rx,
                                geo["win_r"], geo["win_c"], C)
        s = (jnp.sum(out) * 1e-12).astype(DT)
        return c2 + s

    timed(f"{tag}/kernel_only", kernel_only, concat2)

    # prologue only (concat2 formation + geometry + matrices)
    @jax.jit
    def prologue(fs):
        g = _pallas_pool_geometry(list(fs), boxes, list(STRIDES), p, 2,
                                  True, 224.0, 4)
        a, _ = _pallas_axis_matrix(g["ys"], g["lvl_h"], g["wy"],
                                   g["win_r"], p, 2)
        bmat, _ = _pallas_axis_matrix(g["xs"], g["lvl_w"], g["wx"],
                                      g["win_c"], p, 2)
        c2 = _pallas_concat2(list(fs), g)
        s = (jnp.sum(c2.astype(jnp.float32)) * 1e-12
             + jnp.sum(a) * 1e-12 + jnp.sum(bmat) * 1e-12)
        return tuple(f + s.astype(DT) for f in fs)

    timed(f"{tag}/prologue", prologue, feats)

    # dense backward only
    g_out = jnp.ones((B, r, p, p, C), jnp.float32)

    @jax.jit
    def bwd_only(fs):
        df = _pallas_pool_bwd_dense(
            list(fs), boxes, list(STRIDES), p, 2, True, 224.0, 4, g_out)
        return tuple(f + dd.astype(DT) * 1e-12 for f, dd in zip(fs, df))

    timed(f"{tag}/bwd_only", bwd_only, feats)


def main():
    only = os.environ.get("PROF_ONLY")
    mode = os.environ.get("PROF_MODE", "ab")
    if mode == "isolate":
        if only is None or "box" in only:
            bench_isolation("box[512,P7]", 512, 7)
        if only is None or "mask" in only:
            bench_isolation("mask[128,P14]", 128, 14)
        return
    if only is None or "box" in only:
        bench_scale("box[512,P7]", 512, 7)
    if only is None or "mask" in only:
        bench_scale("mask[128,P14]", 128, 14)


if __name__ == "__main__":
    main()

"""ROIAlign — TPU-native bilinear-sampling gather, pure XLA.

Replaces detectron2 v0.1.1's CUDA/C++ ``ROIAlign`` (SURVEY §2.3; exercised
by the ROI heads via Base-RCNN-FPN.yaml:22-31). Numerics follow d2:

  * ``aligned=True``  (d2 "ROIAlignV2", the reference's POOLER_TYPE default)
    shifts sample coordinates by -0.5 (pixel-center alignment).
  * ``aligned=False`` (d2 "ROIAlign") uses the legacy no-shift convention
    and clamps ROI sizes to >= 1.
  * Sample points outside [-1, size] contribute zero; otherwise coordinates
    clamp to the border (exact d2 bilinear_interpolate edge handling).

TPU deviation: d2's ``sampling_ratio=0`` means an adaptive
ceil(roi_size/output_size) grid — a data-dependent shape. We use a fixed
sampling grid (default 2x2 per bin) instead; the AP impact is negligible
(same choice as the TF TPU Mask R-CNN implementations).

The multi-level pooler flattens ALL pyramid levels into one (sum HW, C)
buffer and performs a single gather with per-ROI level offsets, instead of
running the pooler once per level — one big gather beats four masked ones.
"""

from __future__ import annotations

import functools

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(flat_feature: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray,
                     height, width, row_offset) -> jnp.ndarray:
    """Sample flat (sumHW, C) feature at fractional (y, x) within a level.

    Args:
        flat_feature: (sum_HW, C) concatenation of levels.
        y, x: (...,) fractional coords in the level's grid.
        height, width: (...,) int level dims (broadcastable with y/x).
        row_offset: (...,) int start row of the level in flat_feature.

    Returns: (..., C) sampled values (zero for out-of-range points).
    """
    empty = (y < -1.0) | (y > height.astype(y.dtype)) | (x < -1.0) | (x > width.astype(x.dtype))
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)

    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    y_low = jnp.minimum(y_low, height - 1)
    x_low = jnp.minimum(x_low, width - 1)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)
    y = jnp.minimum(y, (height - 1).astype(y.dtype))
    x = jnp.minimum(x, (width - 1).astype(x.dtype))

    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    def take(yy, xx):
        idx = row_offset + yy * width + xx
        return jnp.take(flat_feature, idx, axis=0)

    v1 = take(y_low, x_low)
    v2 = take(y_low, x_high)
    v3 = take(y_high, x_low)
    v4 = take(y_high, x_high)

    w1 = (hy * hx)[..., None]
    w2 = (hy * lx)[..., None]
    w3 = (ly * hx)[..., None]
    w4 = (ly * lx)[..., None]
    out = w1 * v1 + w2 * v2 + w3 * v3 + w4 * v4
    return jnp.where(empty[..., None], 0.0, out)


def _sample_coords(rois: jnp.ndarray, spatial_scale, output_size: int,
                   sampling_ratio: int, aligned: bool):
    """Per-ROI sampling grid: (R, P, P, S, S) y and x fractional coords."""
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    p = jnp.arange(output_size, dtype=rois.dtype)
    s = (jnp.arange(sampling_ratio, dtype=rois.dtype) + 0.5) / sampling_ratio
    # y coord: y1 + (p_y + s_y/S) * bin_h  -> shape (R, P, 1, S, 1)
    ys = (
        y1[:, None, None, None, None]
        + (p[None, :, None, None, None] + s[None, None, None, :, None])
        * bin_h[:, None, None, None, None]
    )
    xs = (
        x1[:, None, None, None, None]
        + (p[None, None, :, None, None] + s[None, None, None, None, :])
        * bin_w[:, None, None, None, None]
    )
    P, S = output_size, sampling_ratio
    ys = jnp.broadcast_to(ys, (rois.shape[0], P, P, S, S))
    xs = jnp.broadcast_to(xs, (rois.shape[0], P, P, S, S))
    return ys, xs


def roi_align(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Single-level ROIAlign.

    Args:
        feature: (H, W, C) NHWC single image feature.
        rois: (R, 4) xyxy boxes in image coordinates.

    Returns: (R, P, P, C).
    """
    h, w, c = feature.shape
    ys, xs = _sample_coords(rois, spatial_scale, output_size, sampling_ratio, aligned)
    flat = feature.reshape(h * w, c)
    hh = jnp.full(ys.shape, h, dtype=jnp.int32)
    ww = jnp.full(ys.shape, w, dtype=jnp.int32)
    off = jnp.zeros(ys.shape, dtype=jnp.int32)
    samples = _bilinear_gather(flat, ys, xs, hh, ww, off)  # (R,P,P,S,S,C)
    return jnp.mean(samples, axis=(3, 4))


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level router (d2 poolers.py assign_boxes_to_levels numerics)."""
    area = jnp.clip(
        (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]), 0.0, None
    )
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(
        canonical_level + jnp.log2(sqrt_area / canonical_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Multi-level ROIAlign with FPN level assignment — one unified gather.

    Args:
        features: per-level (H_l, W_l, C) single-image features, high→low res.
        boxes: (R, 4) xyxy in image coordinates.
        strides: per-level strides (e.g. [4, 8, 16, 32]).

    Returns: (R, P, P, C) pooled features.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    heights = np.array([f.shape[0] for f in features], dtype=np.int32)
    widths = np.array([f.shape[1] for f in features], dtype=np.int32)
    row_offsets = np.concatenate([[0], np.cumsum(heights.astype(np.int64) * widths)])[:-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    min_level = int(np.log2(strides[0]))
    levels = assign_boxes_to_levels(
        boxes, min_level, min_level + num_levels - 1, canonical_size, canonical_level
    )  # (R,) in [0, L)

    scales = jnp.asarray([1.0 / s for s in strides], dtype=boxes.dtype)[levels]  # (R,)
    ys, xs = _sample_coords_per_roi_scale(
        boxes, scales, output_size, sampling_ratio, aligned
    )
    hh = jnp.asarray(heights)[levels][:, None, None, None, None] * jnp.ones_like(ys, dtype=jnp.int32)
    ww = jnp.asarray(widths)[levels][:, None, None, None, None] * jnp.ones_like(ys, dtype=jnp.int32)
    off = jnp.asarray(row_offsets, dtype=jnp.int32)[levels][:, None, None, None, None] * jnp.ones_like(
        ys, dtype=jnp.int32
    )
    samples = _bilinear_gather(flat, ys, xs, hh, ww, off)
    return jnp.mean(samples, axis=(3, 4))


def _sample_coords_per_roi_scale(rois, scales, output_size, sampling_ratio, aligned):
    """Like _sample_coords but with a per-ROI spatial scale vector."""
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * scales - offset
    y1 = rois[:, 1] * scales - offset
    x2 = rois[:, 2] * scales - offset
    y2 = rois[:, 3] * scales - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    p = jnp.arange(output_size, dtype=rois.dtype)
    s = (jnp.arange(sampling_ratio, dtype=rois.dtype) + 0.5) / sampling_ratio
    ys = (
        y1[:, None, None, None, None]
        + (p[None, :, None, None, None] + s[None, None, None, :, None])
        * bin_h[:, None, None, None, None]
    )
    xs = (
        x1[:, None, None, None, None]
        + (p[None, None, :, None, None] + s[None, None, None, None, :])
        * bin_w[:, None, None, None, None]
    )
    P, S = output_size, sampling_ratio
    ys = jnp.broadcast_to(ys, (rois.shape[0], P, P, S, S))
    xs = jnp.broadcast_to(xs, (rois.shape[0], P, P, S, S))
    return ys, xs


# ---------------------------------------------------------------------------
# Windowed matmul ROIAlign — the TPU-fast formulation
# ---------------------------------------------------------------------------

def multilevel_roi_align_windowed(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    window: int = 0,
    overflow_slots: int = 64,
    use_dma_gather: bool = False,
) -> jnp.ndarray:
    """ROIAlign as per-ROI window extraction + two interpolation matmuls.

    Same numerics as ``multilevel_roi_align`` (bilinear == tensor product
    of two 1-D linear interpolations; averaging the S x S samples first is
    linear, so it folds into the interpolation matrices), but structured
    for TPU: instead of ~P*P*S*S*4 scalar gathers per ROI, each ROI does
    ONE contiguous (window, window, C) slice-gather from a row-concatenated
    level tensor followed by two small MXU matmuls:

        out[p, q, :] = (Ry @ W @ Rx^T)[p, q, :]
        Ry[p, k] = mean_s relu(1 - |y_rel[p, s] - k|)   (7 x window)

    Measured ~10x faster than the per-point gather on v5e and fully
    differentiable (backward = scatter of windows + transposed matmuls).

    Memory layout: levels are concatenated along H (each padded to width
    Wmax and height >= window) into one (sumH, Wmax, C) tensor — ~1.33x
    the p2 plane instead of the naive num_levels x Hmax stack (this was
    the batch-16 blocker). Rows read past a level's true height get exactly
    zero interpolation weight (clamped rel coords stay <= H_l - 1), so
    windows may safely straddle the padding.

    Elongated-ROI overflow: the level router bounds sqrt(area)/stride by
    ~28 but a ROI's per-axis extent is ~28*sqrt(aspect); any ROI whose
    (clamped) sample span exceeds ``window`` has trailing bins with zero
    weight. Such ROIs are detected and recomputed EXACTLY with the
    point-gather pooler through a fixed budget of ``overflow_slots``
    correction slots (static shapes; top_k selection). With window=48 the
    slots engage only for aspect ratio >~ 3 boxes.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    r = boxes.shape[0]
    p = output_size
    s = sampling_ratio
    dtype = features[0].dtype

    heights = np.array([f.shape[0] for f in features], dtype=np.int32)
    widths = np.array([f.shape[1] for f in features], dtype=np.int32)
    if window <= 0:
        top_extent = max(int(heights[-1]), int(widths[-1])) + 2
        window = int(np.ceil(max(48, top_extent) / 8) * 8)
        if use_dma_gather:
            # +8 slack: the DMA extractor needs 8-aligned column starts,
            # and rounding a start down shifts it up to 7 columns left.
            window += 8
    wmax = max(int(widths.max()), window)
    # Row-concatenated (sumH, Wmax, C) tensor: one dynamic-slice source.
    pad_h = np.maximum(heights, window)
    row_base = np.concatenate([[0], np.cumsum(pad_h)])[:-1].astype(np.int32)
    concat = jnp.concatenate(
        [
            jnp.pad(f, ((0, int(ph) - f.shape[0]), (0, wmax - f.shape[1]), (0, 0)))
            for f, ph in zip(features, pad_h)
        ],
        axis=0,
    )

    min_level = int(np.log2(strides[0]))
    levels = assign_boxes_to_levels(
        boxes, min_level, min_level + num_levels - 1, canonical_size, canonical_level
    )
    scales = jnp.asarray([1.0 / st for st in strides], dtype=boxes.dtype)[levels]
    lvl_h = jnp.asarray(heights)[levels]
    lvl_w = jnp.asarray(widths)[levels]
    lvl_base = jnp.asarray(row_base)[levels]

    # absolute sample coords (R, P*S) per axis (d2 aligned formula)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * scales - offset
    y1 = boxes[:, 1] * scales - offset
    x2 = boxes[:, 2] * scales - offset
    y2 = boxes[:, 3] * scales - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    grid = (
        jnp.arange(p, dtype=boxes.dtype)[:, None]
        + (jnp.arange(s, dtype=boxes.dtype)[None, :] + 0.5) / s
    ).reshape(-1)  # (P*S,)
    ys = y1[:, None] + grid[None, :] * (roi_h / p)[:, None]
    xs = x1[:, None] + grid[None, :] * (roi_w / p)[:, None]

    def axis_matrix(coords, size, win_start):
        """(R, P*S) abs coords -> (R, P, window) matrix + per-ROI max rel."""
        # d2 border handling: outside [-1, size] -> zero; else clamp [0, size-1]
        valid = (coords >= -1.0) & (coords <= size[:, None].astype(coords.dtype))
        cl = jnp.clip(coords, 0.0, None)
        cl = jnp.minimum(cl, (size[:, None] - 1).astype(coords.dtype))
        rel = cl - win_start[:, None].astype(coords.dtype)
        k = jnp.arange(window, dtype=coords.dtype)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, None] - k[None, None, :]))
        a = a * valid[:, :, None]
        a = a.reshape(r, p, s, window)
        return jnp.mean(a, axis=2), jnp.max(rel, axis=1)

    # window starts (clamped so the window stays inside the level extent)
    def win_start(coords, size):
        lo = jnp.floor(jnp.min(coords, axis=1)).astype(jnp.int32) - 1
        hi = jnp.maximum(size - window, 0)
        return jnp.clip(lo, 0, hi)

    wy = win_start(ys, lvl_h)
    wx = win_start(xs, lvl_w)
    if use_dma_gather:
        # column starts 8-aligned (DMA sublane alignment; rounding down
        # only extends coverage left — the +8 window slack absorbs it,
        # and the interpolation weights are computed relative to the
        # rounded start so the math is unchanged)
        wx = (wx // 8) * 8

    ry, max_rel_y = axis_matrix(ys, lvl_h, wy)  # (R, P, window)
    rx, max_rel_x = axis_matrix(xs, lvl_w, wx)
    ry = ry.astype(dtype)
    rx = rx.astype(dtype)

    if use_dma_gather:
        # per-ROI hardware DMA (ops/pallas/window_gather.py). Measured
        # SLOWER in the full stage-3 step (14.6 vs 16.4 img/s): the
        # one-DMA-per-grid-step kernel serializes 512 copies and the +8
        # window slack grows both phases, while XLA's fused gather
        # overlaps with surrounding compute. Kept selectable for
        # future batched-DMA iterations.
        from .pallas.window_gather import gather_windows

        windows = gather_windows(concat, lvl_base + wy, wx, window)
    else:
        windows = jax.vmap(
            lambda row, x: jax.lax.dynamic_slice(
                concat, (row, x, 0), (window, window, c)
            )
        )(lvl_base + wy, wx)  # (R, window, window, C)

    # out[r] = Ry[r] @ win[r] @ Rx[r]^T  (two batched MXU matmuls)
    tmp = jnp.einsum("rpk,rkwc->rpwc", ry, windows,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("rqw,rpwc->rpqc", rx, tmp.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out.astype(jnp.float32)

    # --- exact correction for window-overflow (high-aspect) ROIs ---
    if overflow_slots > 0 and r > 0:
        overflow = (max_rel_y > window - 1.0) | (max_rel_x > window - 1.0)
        k_slots = min(int(overflow_slots), r)
        _, sel = jax.lax.top_k(overflow.astype(jnp.float32), k_slots)
        corrected = multilevel_roi_align(
            list(features), boxes[sel], list(strides), output_size,
            sampling_ratio, aligned, canonical_size, canonical_level,
        ).astype(jnp.float32)
        fix = jnp.where(overflow[sel][:, None, None, None], corrected, out[sel])
        out = out.at[sel].set(fix)
    return out


# ---------------------------------------------------------------------------
# Best-of-both pooler: windowed matmul forward + point-scatter backward
# ---------------------------------------------------------------------------

def _pooler_scatter_bwd(features, boxes, strides, output_size, sampling_ratio,
                        aligned, canonical_size, canonical_level, g):
    """Explicit transpose of the bilinear sampling: scatter g back to the
    per-level feature grads. Much cheaper than the windowed op's dense
    window scatter (which writes mostly zeros)."""
    num_levels = len(features)
    c = features[0].shape[-1]
    heights = np.array([f.shape[0] for f in features], dtype=np.int32)
    widths = np.array([f.shape[1] for f in features], dtype=np.int32)
    row_offsets = np.concatenate(
        [[0], np.cumsum(heights.astype(np.int64) * widths)]
    )[:-1]
    total = int((heights.astype(np.int64) * widths).sum())

    min_level = int(np.log2(strides[0]))
    levels = assign_boxes_to_levels(
        boxes, min_level, min_level + num_levels - 1, canonical_size, canonical_level
    )
    scales = jnp.asarray([1.0 / s for s in strides], dtype=boxes.dtype)[levels]
    ys, xs = _sample_coords_per_roi_scale(
        boxes, scales, output_size, sampling_ratio, aligned
    )
    shape5 = ys.shape  # (R, P, P, S, S)
    hh = jnp.asarray(heights)[levels][:, None, None, None, None] * jnp.ones(shape5, jnp.int32)
    ww = jnp.asarray(widths)[levels][:, None, None, None, None] * jnp.ones(shape5, jnp.int32)
    off = jnp.asarray(row_offsets, dtype=jnp.int32)[levels][
        :, None, None, None, None
    ] * jnp.ones(shape5, jnp.int32)

    y, x = ys, xs
    empty = (y < -1.0) | (y > hh.astype(y.dtype)) | (x < -1.0) | (x > ww.astype(x.dtype))
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y).astype(jnp.int32), hh - 1)
    x_low = jnp.minimum(jnp.floor(x).astype(jnp.int32), ww - 1)
    y_high = jnp.minimum(y_low + 1, hh - 1)
    x_high = jnp.minimum(x_low + 1, ww - 1)
    y = jnp.minimum(y, (hh - 1).astype(y.dtype))
    x = jnp.minimum(x, (ww - 1).astype(x.dtype))
    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    s2 = sampling_ratio * sampling_ratio
    gs = (g.astype(jnp.float32) / s2)[:, :, :, None, None, :] * jnp.ones(
        shape5 + (1,), jnp.float32
    )
    gs = jnp.where(empty[..., None], 0.0, gs)

    flat_g = jnp.zeros((total, c), jnp.float32)
    for wgt, yy, xx in (
        (hy * hx, y_low, x_low),
        (hy * lx, y_low, x_high),
        (ly * hx, y_high, x_low),
        (ly * lx, y_high, x_high),
    ):
        idx = (off + yy * ww + xx).reshape(-1)
        vals = (wgt[..., None] * gs).reshape(-1, c)
        flat_g = flat_g.at[idx].add(vals)

    out = []
    for l in range(num_levels):
        start = int(row_offsets[l])
        n = int(heights[l]) * int(widths[l])
        out.append(
            flat_g[start : start + n].reshape(int(heights[l]), int(widths[l]), c)
            .astype(features[l].dtype)
        )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def multilevel_roi_align_fast(
    features, boxes, strides, output_size, sampling_ratio=2, aligned=True,
    canonical_size=224.0, canonical_level=4,
):
    """Windowed-matmul forward + explicit point-scatter backward (wrt
    features only; boxes are treated as non-differentiable, matching the
    detector's stop-gradient on proposals)."""
    return multilevel_roi_align_windowed(
        list(features), boxes, list(strides), output_size, sampling_ratio,
        aligned, canonical_size, canonical_level,
    )


def _fast_fwd(features, boxes, strides, output_size, sampling_ratio, aligned,
              canonical_size, canonical_level):
    out = multilevel_roi_align_windowed(
        list(features), boxes, list(strides), output_size, sampling_ratio,
        aligned, canonical_size, canonical_level,
    )
    return out, (features, boxes)


def _fast_bwd(strides, output_size, sampling_ratio, aligned, canonical_size,
              canonical_level, res, g):
    features, boxes = res
    df = _pooler_scatter_bwd(
        list(features), boxes, list(strides), output_size, sampling_ratio,
        aligned, canonical_size, canonical_level, g,
    )
    return (tuple(df), jnp.zeros_like(boxes))


multilevel_roi_align_fast.defvjp(_fast_fwd, _fast_bwd)


# ---------------------------------------------------------------------------
# Fused Pallas pooler: batched window DMA + MXU interpolation, dense bwd
# ---------------------------------------------------------------------------

def _pallas_axis_matrix(coords, size, win_start, window, p, s):
    """(N, P*S) abs coords -> (N, P, window) interp matrix + max rel coord.

    Same numerics as the windowed pooler's axis_matrix (d2 border
    handling: outside [-1, size] -> zero weight, else clamp to border).
    """
    n = coords.shape[0]
    valid = (coords >= -1.0) & (coords <= size[:, None].astype(coords.dtype))
    cl = jnp.clip(coords, 0.0, None)
    cl = jnp.minimum(cl, (size[:, None] - 1).astype(coords.dtype))
    rel = cl - win_start[:, None].astype(coords.dtype)
    k = jnp.arange(window, dtype=coords.dtype)
    a = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, None] - k[None, None, :]))
    a = a * valid[:, :, None]
    a = a.reshape(n, p, s, window)
    return jnp.mean(a, axis=2), jnp.max(rel, axis=1)


def _pallas_pool_geometry(features, boxes, strides, output_size,
                          sampling_ratio, aligned, canonical_size,
                          canonical_level):
    """Shared prologue: level routing, window starts, sample coords.

    features: list of (B, H_l, W_l, C); boxes: (B, R, 4).
    Returns a dict of flattened (N = B*R) per-ROI geometry plus the
    static layout (pad_h, row_base, wmax, win_r, win_c).
    """
    b, _, _, c = features[0].shape
    r = boxes.shape[1]
    p = output_size
    s = sampling_ratio
    heights = np.array([f.shape[1] for f in features], dtype=np.int32)
    widths = np.array([f.shape[2] for f in features], dtype=np.int32)
    top_extent = max(int(heights[-1]), int(widths[-1])) + 2
    window = int(np.ceil(max(48, top_extent) / 8) * 8)
    # +8 on BOTH axes: window starts are rounded down to multiples of 8
    # (Mosaic must prove tile alignment of the DMA slice; rows are the
    # sublane dim of the merged (totalH, Wmax*C) layout) and the slack
    # absorbs the round-down.
    win_r = window + 8
    win_c = window + 8
    # wmax rounded up to a multiple of 8 so the 8-aligned-up column clip
    # bound (below) keeps start + win_c <= wmax for the widest level.
    wmax = max(int((int(widths.max()) + 7) // 8 * 8), win_c)
    # pad_h multiples of 8 keep every level's (and image's) row base —
    # hence every aligned window start — provably 8-aligned.
    pad_h = (np.maximum(heights, win_r) + 7) // 8 * 8
    row_base = np.concatenate([[0], np.cumsum(pad_h)])[:-1].astype(np.int32)
    sumh = int(pad_h.sum())

    flat_boxes = boxes.reshape(b * r, 4)
    min_level = int(np.log2(strides[0]))
    levels = assign_boxes_to_levels(
        flat_boxes, min_level, min_level + len(features) - 1,
        canonical_size, canonical_level,
    )
    scales = jnp.asarray([1.0 / st for st in strides], flat_boxes.dtype)[levels]
    lvl_h = jnp.asarray(heights)[levels]
    lvl_w = jnp.asarray(widths)[levels]
    lvl_base = jnp.asarray(row_base)[levels]

    offset = 0.5 if aligned else 0.0
    x1 = flat_boxes[:, 0] * scales - offset
    y1 = flat_boxes[:, 1] * scales - offset
    x2 = flat_boxes[:, 2] * scales - offset
    y2 = flat_boxes[:, 3] * scales - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    grid = (
        jnp.arange(p, dtype=flat_boxes.dtype)[:, None]
        + (jnp.arange(s, dtype=flat_boxes.dtype)[None, :] + 0.5) / s
    ).reshape(-1)
    ys = y1[:, None] + grid[None, :] * (roi_h / p)[:, None]  # (N, P*S)
    xs = x1[:, None] + grid[None, :] * (roi_w / p)[:, None]

    # Clip bounds are rounded UP to multiples of 8: starts must be
    # 8-aligned, and an aligned-DOWN bound would leave the level's last
    # (lvl % 8) rows/cols reachable only through the capped overflow
    # pass (bottom-of-p3 / right-of-p4 ROIs at 800x1344). Aligning up is
    # exactly in bounds: win_r/win_c are multiples of 8, so
    # ceil((lvl - win)/8)*8 + win == ceil(lvl/8)*8 <= pad_h (resp. wmax).
    ub_y = (jnp.maximum(lvl_h - win_r, 0) + 7) // 8 * 8
    ub_x = (jnp.maximum(lvl_w - win_c, 0) + 7) // 8 * 8
    wy = jnp.clip(
        jnp.floor(jnp.min(ys, axis=1)).astype(jnp.int32) - 1, 0, ub_y,
    )
    wx = jnp.clip(
        jnp.floor(jnp.min(xs, axis=1)).astype(jnp.int32) - 1, 0, ub_x,
    )
    # round starts down to multiples of 8 (DMA tile alignment; the +8
    # window slack absorbs the shift — weights are relative to the
    # rounded start, so the math is unchanged)
    wy = (wy // 8) * 8
    wx = (wx // 8) * 8

    return dict(
        b=b, r=r, c=c, p=p, s=s, sumh=sumh, wmax=wmax,
        win_r=win_r, win_c=win_c, pad_h=pad_h, row_base=row_base,
        heights=heights, widths=widths,
        ys=ys, xs=xs, lvl_h=lvl_h, lvl_w=lvl_w, lvl_base=lvl_base,
        wy=wy, wx=wx,
    )


def _pallas_concat2(features, geo):
    b, c, wmax = geo["b"], geo["c"], geo["wmax"]
    concat = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, int(ph) - f.shape[1]),
                        (0, wmax - f.shape[2]), (0, 0)))
            for f, ph in zip(features, geo["pad_h"])
        ],
        axis=1,
    )  # (B, sumH, Wmax, C)
    return concat.reshape(b * geo["sumh"], wmax * c)


def _pallas_pool_forward(features, boxes, strides, output_size,
                         sampling_ratio, aligned, canonical_size,
                         canonical_level, overflow_slots, interpret):
    from .pallas.roi_pool import fused_window_pool

    geo = _pallas_pool_geometry(
        features, boxes, strides, output_size, sampling_ratio, aligned,
        canonical_size, canonical_level,
    )
    b, r, c, p = geo["b"], geo["r"], geo["c"], geo["p"]
    win_r, win_c = geo["win_r"], geo["win_c"]
    dtype = features[0].dtype

    ry, max_rel_y = _pallas_axis_matrix(
        geo["ys"], geo["lvl_h"], geo["wy"], win_r, p, geo["s"])
    rx, max_rel_x = _pallas_axis_matrix(
        geo["xs"], geo["lvl_w"], geo["wx"], win_c, p, geo["s"])

    concat2 = _pallas_concat2(features, geo)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    rows_abs = img_idx * geo["sumh"] + geo["lvl_base"] + geo["wy"]

    out = fused_window_pool(
        concat2, (rows_abs // 8).astype(jnp.int32),
        (geo["wx"] // 8).astype(jnp.int32),
        ry.astype(dtype), rx.astype(dtype),
        win_r, win_c, c, interpret=interpret,
    ).reshape(b, r, p, p, c)

    # Exact correction for window-overflow (high-aspect) ROIs: a second
    # kernel pass whose window spans the WHOLE level (tall_r rows x full
    # wmax columns), so no valid tap can fall outside it. Top-K selection
    # is over the flattened batch (K total slots, not per image); beyond
    # K overflowing ROIs the main-pass (window-truncated) value is kept.
    # The pass is gated behind lax.cond: with the aligned-up clip bounds
    # ordinary ROIs never overflow, and the correction's K full-level
    # window DMAs (tall_r x wmax x C each) are pure waste on the common
    # all-in-window call.
    if overflow_slots > 0 and r > 0:
        overflow = (max_rel_y > win_r - 1.0) | (max_rel_x > win_c - 1.0)
        k_slots = min(int(overflow_slots), b * r)

        def with_correction(out_in):
            _, sel = jax.lax.top_k(overflow.astype(jnp.float32), k_slots)
            tall_r = int(geo["pad_h"].max())  # multiple of 8; covers any level
            wmax = geo["wmax"]
            base_abs = (img_idx * geo["sumh"] + geo["lvl_base"])[sel]
            # Row start may go NEGATIVE (window reaches into the previous
            # level's rows — weights there are zero) so the slice never
            # runs past the end of concat2. All terms are multiples of 8.
            local_start = jnp.minimum(0, (b * geo["sumh"] - tall_r) - base_abs)
            ry2, _ = _pallas_axis_matrix(
                geo["ys"][sel], geo["lvl_h"][sel], local_start, tall_r, p,
                geo["s"])
            rx2, _ = _pallas_axis_matrix(
                geo["xs"][sel], geo["lvl_w"][sel], jnp.zeros_like(local_start),
                wmax, p, geo["s"])
            corrected = fused_window_pool(
                concat2, ((base_abs + local_start) // 8).astype(jnp.int32),
                jnp.zeros((k_slots,), jnp.int32),
                ry2.astype(dtype), rx2.astype(dtype),
                tall_r, wmax, c, interpret=interpret,
                vmem_limit=100 * 1024 * 1024,
            )
            out_flat = out_in.reshape(b * r, p, p, c)
            fix = jnp.where(
                overflow[sel][:, None, None, None], corrected, out_flat[sel]
            )
            return out_flat.at[sel].set(fix).reshape(b, r, p, p, c)

        out = jax.lax.cond(
            jnp.any(overflow), with_correction, lambda o: o, out
        )
    return out


def _pallas_pool_bwd_dense(features, boxes, strides, output_size,
                           sampling_ratio, aligned, canonical_size,
                           canonical_level, g):
    """Adjoint of the exact bilinear interpolation as two dense MXU
    matmuls per ROI chunk — no scatter. d_concat[h, w] accumulates
    Ay^T @ g @ Ax over ROIs, then splits back into per-level grads."""
    geo = _pallas_pool_geometry(
        features, boxes, strides, output_size, sampling_ratio, aligned,
        canonical_size, canonical_level,
    )
    b, r, c, p, s = geo["b"], geo["r"], geo["c"], geo["p"], geo["s"]
    sumh, wmax = geo["sumh"], geo["wmax"]
    dtype = features[0].dtype

    # Full-axis interpolation matrices (window == whole padded extent).
    # The border clamp must stay LEVEL-local, so coords/size are local and
    # only the tap index is globalized via a negative window start:
    # rel = clamp(y) - (-lvl_base) spans exactly the level's global rows.
    zero = jnp.zeros_like(geo["wy"])
    ay, _ = _pallas_axis_matrix(
        geo["ys"], geo["lvl_h"], -geo["lvl_base"], sumh, p, s)
    ax, _ = _pallas_axis_matrix(geo["xs"], geo["lvl_w"], zero, wmax, p, s)

    ay = ay.reshape(b, r, p, sumh).astype(dtype)
    ax = ax.reshape(b, r, p, wmax).astype(dtype)
    gb = g.astype(dtype)

    # Chunk the ROI axis so the (b, chunk, p, wmax, c) einsum transient
    # stays bounded (~2.5 GB) regardless of batch: at b=16/P=14 a
    # 128-chunk intermediate reaches ~5 GB and dominates backward peak
    # memory (the batch-16 regime, BENCH_BATCH=16). The bound is chosen
    # to leave the measured batch-8 chunking (128) unchanged.
    budget = 5 * (1 << 29)
    chunk = r
    for cand in (128, 64, 32, 16, 8):
        if r % cand == 0:
            chunk = cand
            bytes_tmp = b * cand * p * wmax * c * jnp.dtype(dtype).itemsize
            if bytes_tmp <= budget:
                break
    nch = r // chunk

    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape(b, nch, chunk, *x.shape[2:]), 1, 0)

    def body(acc, xs):
        g_c, ay_c, ax_c = xs
        tmp = jnp.einsum("brpqc,brqw->brpwc", g_c, ax_c,
                         preferred_element_type=jnp.float32).astype(dtype)
        acc = acc + jnp.einsum("brph,brpwc->bhwc", ay_c, tmp,
                               preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((b, sumh, wmax, c), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (to_chunks(gb), to_chunks(ay),
                                       to_chunks(ax)))

    grads = []
    for l, f in enumerate(features):
        base = int(geo["row_base"][l])
        h, w = f.shape[1], f.shape[2]
        grads.append(acc[:, base:base + h, :w, :].astype(f.dtype))
    return grads


def pallas_pooler_supported(channels: int) -> bool:
    """Whether the fused Pallas window-pool kernel supports this channel
    count. The kernel's contiguity-preserving reshape (p*win_c, c) in
    _pool_kernel (ops/pallas/roi_pool.py:72) is a layout no-op only when
    C is lane-aligned (a multiple of 128); Mosaic rejects it otherwise —
    first hit by the BiFPN families' 160-channel pyramid (CenterMask
    R-50-BiFPN, round 5). Callers fall back to the "fast" pooler."""
    return channels % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multilevel_roi_align_pallas(
    features, boxes, strides, output_size, sampling_ratio=2, aligned=True,
    canonical_size=224.0, canonical_level=4, overflow_slots=64,
):
    """Batched multi-level ROIAlign via the fused Pallas window-pool
    kernel (ops/pallas/roi_pool.py). features: tuple of (B, H_l, W_l, C);
    boxes (B, R, 4) -> (B, R, P, P, C) float32. Backward wrt features is
    the dense-matmul adjoint (no scatter); boxes get zero grad (the
    detector stop-gradients proposals)."""
    interpret = jax.default_backend() != "tpu"
    return _pallas_pool_forward(
        list(features), boxes, list(strides), output_size, sampling_ratio,
        aligned, canonical_size, canonical_level, overflow_slots, interpret,
    )


def _pallas_fwd(features, boxes, strides, output_size, sampling_ratio,
                aligned, canonical_size, canonical_level, overflow_slots):
    out = multilevel_roi_align_pallas(
        features, boxes, strides, output_size, sampling_ratio, aligned,
        canonical_size, canonical_level, overflow_slots,
    )
    return out, (features, boxes)


def _pallas_bwd(strides, output_size, sampling_ratio, aligned,
                canonical_size, canonical_level, overflow_slots, res, g):
    features, boxes = res
    df = _pallas_pool_bwd_dense(
        list(features), boxes, list(strides), output_size, sampling_ratio,
        aligned, canonical_size, canonical_level, g,
    )
    return (tuple(df), jnp.zeros_like(boxes))


multilevel_roi_align_pallas.defvjp(_pallas_fwd, _pallas_bwd)

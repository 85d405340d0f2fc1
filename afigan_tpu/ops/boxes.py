"""Box primitives: pairwise IoU, encode/decode, clipping — pure XLA.

TPU-native replacement for the d2/torchvision C++/CUDA box helpers the
reference depends on (SURVEY §2.3 "box IoU / proposal matching").
Numerics match detectron2 v0.1.1 (x1,y1,x2,y2 convention, no +1):
  * pairwise_iou        — d2 structures/boxes.py pairwise_iou
  * Box2BoxTransform    — d2 modeling/box_regression.py (get_deltas /
                          apply_deltas with the log(1000/16) scale clamp)

All functions are shape-polymorphic pure functions over fixed-size
(padded) arrays; invalid rows are handled by callers via masks.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

# d2's scale clamp: boxes can grow at most 1000/16 per regression step
_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Areas of (..., 4) boxes in xyxy format."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) intersection areas."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU matrix. Zero where union is empty."""
    inter = pairwise_intersection(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over area of boxes2: (N, M)."""
    inter = pairwise_intersection(boxes1, boxes2)
    area2 = box_area(boxes2)
    return jnp.where(area2[None, :] > 0, inter / jnp.maximum(area2[None, :], 1e-12), 0.0)


def clip_boxes(boxes: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Clip (..., 4) xyxy boxes to [0, W] x [0, H]. image_size is (h, w)."""
    h, w = image_size[0], image_size[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """True where box width and height both exceed threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


class Box2BoxTransform:
    """d2-compatible box regression transform (dx, dy, dw, dh)."""

    def __init__(self, weights: Sequence[float], scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """Regression targets mapping src (anchors/proposals) -> target (gt)."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        eps = 1e-12
        dx = wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps)
        dy = wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps)
        dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps))
        dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps))
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Apply (..., k*4) deltas to (..., 4) boxes -> (..., k*4) boxes."""
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        shp = deltas.shape[:-1] + (-1, 4)
        d = deltas.reshape(shp)
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.clip(d[..., 2] / ww, None, self.scale_clamp)
        dh = jnp.clip(d[..., 3] / wh, None, self.scale_clamp)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        out = jnp.stack(
            [
                pred_ctr_x - 0.5 * pred_w,
                pred_ctr_y - 0.5 * pred_h,
                pred_ctr_x + 0.5 * pred_w,
                pred_ctr_y + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(deltas.shape)

"""Fast R-CNN box head + output layers + fixed-shape inference.

d2-v0.1.1 parity (used by the reference via ROI_BOX_HEAD config keys):
  * ``FastRCNNConvFCHead``: NUM_CONV 3x3 convs then NUM_FC fully-connected
    layers (fc_dim 1024), ReLU between (d2 roi_heads/box_head.py).
  * ``FastRCNNOutputLayers``: linear cls (C+1) + linear box deltas
    (4C, or 4 if class-agnostic); init normal(0.01)/normal(0.001).
  * losses: softmax CE (mean over sampled) + smooth-L1 over foreground
    class-specific delta columns, sum / num_sampled (d2 fast_rcnn.py).
  * ``fast_rcnn_inference``: fixed-shape redesign — flatten (R, C) scores,
    score-threshold as a validity mask, top-k candidate pool, class-aware
    NMS via the offset trick, fixed max-detections output.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.losses import smooth_l1

from ..ops import batched_nms_padded, clip_boxes, nonempty_mask
from .layers import Conv, c2_msra_fill, c2_xavier_fill

Dtype = Any


class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(R, P, P, C) pooled features -> (R, fc_dim)."""
        for i in range(self.num_conv):
            x = Conv(self.conv_dim, 3, padding=1, norm=self.norm,
                     use_bias=(self.norm == ""), train=self.train,
                     axis_name=self.axis_name, kernel_init=c2_msra_fill(),
                     dtype=self.dtype, name=f"conv{i+1}")(x)
            x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, kernel_init=c2_xavier_fill(),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i+1}")(x)
            x = jax.nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes + 1,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_score")(x)
        num_bbox = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(num_bbox * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="bbox_pred")(x)
        return scores, deltas


def fast_rcnn_losses(
    class_logits: jnp.ndarray,  # (R, C+1)
    pred_deltas: jnp.ndarray,  # (R, 4C) or (R, 4)
    gt_classes: jnp.ndarray,  # (R,) in [0, C] (C = background)
    gt_deltas: jnp.ndarray,  # (R, 4) targets vs proposals
    valid: jnp.ndarray,  # (R,) sampled-row validity
    num_classes: int,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    logits = class_logits.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_classes[:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / n_valid

    fg = valid & (gt_classes < num_classes)
    d = pred_deltas.astype(jnp.float32).reshape(pred_deltas.shape[0], -1, 4)
    if d.shape[1] == 1:
        sel = d[:, 0]
    else:
        cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
        sel = jnp.take_along_axis(d, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    l1 = smooth_l1(sel, gt_deltas, smooth_l1_beta)
    loss_box = jnp.sum(jnp.where(fg[:, None], l1, 0.0)) / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (D, 4)
    scores: jnp.ndarray  # (D,)
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool
    keypoints: Optional[jnp.ndarray] = None  # (D, K, 3) [x, y, score]


def fast_rcnn_inference_single(
    boxes: jnp.ndarray,  # (R, C, 4) decoded per-class boxes (or (R, 1, 4))
    scores: jnp.ndarray,  # (R, C+1) softmax probabilities
    image_size: jnp.ndarray,  # (2,)
    proposal_valid: jnp.ndarray,  # (R,)
    score_thresh: float,
    nms_thresh: float,
    max_detections: int,
    candidate_pool: int = 4096,
) -> Detections:
    """Fixed-shape d2 fast_rcnn_inference_single_image."""
    r, c = scores.shape[0], scores.shape[1] - 1
    fg_scores = scores[:, :c]  # drop background column
    if boxes.shape[1] == 1:
        boxes = jnp.broadcast_to(boxes, (r, c, 4))
    boxes = clip_boxes(boxes, image_size)

    flat_scores = fg_scores.reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    flat_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))
    flat_valid = (
        (flat_scores > score_thresh)
        & jnp.repeat(proposal_valid, c)
        & nonempty_mask(flat_boxes)
    )

    k = min(candidate_pool, flat_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(flat_valid, flat_scores, -1.0), k
    )
    cand_boxes = flat_boxes[cand_idx]
    cand_classes = flat_classes[cand_idx]
    cand_valid = cand_scores > 0

    ob, osc, oi, ov = batched_nms_padded(
        cand_boxes, cand_scores, cand_classes, nms_thresh, max_detections,
        valid=cand_valid,
    )
    return Detections(
        boxes=ob,
        scores=jnp.where(ov, osc, 0.0),
        classes=cand_classes[oi],
        valid=ov,
    )

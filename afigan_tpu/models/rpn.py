"""Region Proposal Network — d2-v0.1.1 semantics, fixed-shape TPU design.

The reference uses d2's RPN unmodified (SURVEY §2.2, Base-RCNN-FPN.yaml:9-20).
Re-designed here as:
  * ``RPNHead`` (flax): shared 3x3 conv + 1x1 objectness / 1x1 deltas,
    applied to every pyramid level.
  * ``label_anchors``: Matcher(0.3/0.7, low-quality) + 256-anchor subsample
    (pure functions, vmapped over the batch).
  * ``rpn_losses``: BCE objectness + smooth-L1 (beta=0 → L1) localization,
    both sum-normalized by batch_size_per_image * num_images (d2 numerics).
  * ``generate_proposals``: per-level top-k → decode → clip → cross-level
    batched NMS (level-offset trick) → fixed post_nms_topk output with
    validity mask. All shapes static; no dynamic proposal counts anywhere.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    Box2BoxTransform,
    Matcher,
    batched_nms_padded,
    clip_boxes,
    nonempty_mask,
    pairwise_iou,
    subsample_labels,
)
from ..ops.losses import bce_with_logits, smooth_l1
from .layers import Conv

Dtype = Any


class RPNHead(nn.Module):
    """Shared conv head (d2 StandardRPNHead)."""

    num_anchors: int
    conv_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = Conv(self.conv_dim, 3, padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01), name="conv")
        obj = Conv(self.num_anchors, 1, padding=0, dtype=self.dtype,
                   kernel_init=nn.initializers.normal(0.01), name="objectness_logits")
        deltas = Conv(self.num_anchors * 4, 1, padding=0, dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01), name="anchor_deltas")
        logits, d = [], []
        for f in features:
            t = jax.nn.relu(conv(f))
            logits.append(obj(t))
            d.append(deltas(t))
        return logits, d


class RPNOutput(NamedTuple):
    proposals: jnp.ndarray  # (B, K, 4)
    scores: jnp.ndarray  # (B, K) objectness logits of survivors
    valid: jnp.ndarray  # (B, K) bool


def _flatten_level(logits: jnp.ndarray, deltas: jnp.ndarray):
    """(B,H,W,A) & (B,H,W,A*4) -> (B,HWA) & (B,HWA,4) matching anchor order."""
    b, h, w, a = logits.shape
    return logits.reshape(b, h * w * a), deltas.reshape(b, h * w * a, 4)


def label_anchors(
    key: jax.Array,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
    matcher: Matcher,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single image: anchors (N,4), gt (M,4)+(M,) valid.

    Returns (labels (N,) in {-1,0,1} after subsampling — non-sampled
    anchors are folded in as -1 — and matched_gt_idx (N,))."""
    iou = pairwise_iou(gt_boxes, anchors)  # (M, N)
    matched_idx, labels = matcher(iou, gt_valid)
    labels = labels.astype(jnp.int32)
    # subsample: non-selected → -1 (ignored), d2 rpn.py label_and_sample_anchors
    idx, valid = subsample_labels(
        key, labels, batch_size_per_image, positive_fraction, bg_label=0
    )
    # .max(), not .set(): filler slots carry valid=False at arbitrary
    # in-range indices, and a duplicate-index scatter-set could
    # nondeterministically drop a genuinely sampled anchor
    sampled = jnp.zeros(labels.shape, dtype=bool).at[idx].max(valid)
    labels = jnp.where(sampled, labels, -1)
    return labels, matched_idx


def rpn_losses(
    labels: jnp.ndarray,  # (B, N) in {-1, 0, 1}
    matched_idx: jnp.ndarray,  # (B, N)
    gt_boxes: jnp.ndarray,  # (B, M, 4)
    anchors: jnp.ndarray,  # (N, 4)
    pred_logits: jnp.ndarray,  # (B, N)
    pred_deltas: jnp.ndarray,  # (B, N, 4)
    box2box: Box2BoxTransform,
    batch_size_per_image: int,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    b = labels.shape[0]
    normalizer = batch_size_per_image * b

    matched_gt = jnp.take_along_axis(gt_boxes, matched_idx[..., None], axis=1)
    gt_deltas = box2box.get_deltas(jnp.broadcast_to(anchors, matched_gt.shape), matched_gt)

    pos = labels == 1
    sampled = labels >= 0

    loc = smooth_l1(pred_deltas.astype(jnp.float32), gt_deltas, smooth_l1_beta)
    loss_loc = jnp.sum(jnp.where(pos[..., None], loc, 0.0)) / normalizer

    logits = pred_logits.astype(jnp.float32)
    obj = bce_with_logits(logits, pos.astype(jnp.float32))
    loss_obj = jnp.sum(jnp.where(sampled, obj, 0.0)) / normalizer
    return {"loss_rpn_cls": loss_obj, "loss_rpn_loc": loss_loc}


def generate_proposals(
    anchors_per_level: Sequence[jnp.ndarray],
    logits_per_level: Sequence[jnp.ndarray],  # (B, H, W, A)
    deltas_per_level: Sequence[jnp.ndarray],  # (B, H, W, A*4)
    image_sizes: jnp.ndarray,  # (B, 2)
    box2box: Box2BoxTransform,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float,
    min_size: float = 0.0,
    approx_topk: bool = False,
) -> RPNOutput:
    """Fixed-shape d2 find_top_rpn_proposals.

    ``approx_topk``: use ``jax.lax.approx_max_k`` for the per-level
    pre-NMS top-k (TPU-optimized PartialReduce, recall >= 0.95 of the
    exact top-k). The missed entries are tail candidates that NMS would
    almost surely drop anyway; enabled for TRAINING only (TPU.APPROX_TOPK)
    so eval numerics stay exactly d2."""
    b = logits_per_level[0].shape[0]
    all_boxes, all_scores, all_levels, all_valid = [], [], [], []
    for lvl, (anch, lg, dl) in enumerate(
        zip(anchors_per_level, logits_per_level, deltas_per_level)
    ):
        scores, deltas = _flatten_level(lg, dl)
        scores = jax.lax.stop_gradient(scores.astype(jnp.float32))
        deltas = jax.lax.stop_gradient(deltas.astype(jnp.float32))
        k = min(pre_nms_topk, scores.shape[1])
        if approx_topk and k < scores.shape[1]:
            top_scores, top_idx = jax.lax.approx_max_k(scores, k)  # (B, k)
        else:
            top_scores, top_idx = jax.lax.top_k(scores, k)  # (B, k)
        top_deltas = jnp.take_along_axis(deltas, top_idx[..., None], axis=1)
        top_anchors = anch[top_idx]  # (B, k, 4)
        boxes = box2box.apply_deltas(top_deltas, top_anchors)
        all_boxes.append(boxes)
        all_scores.append(top_scores)
        all_levels.append(jnp.full((b, k), lvl, dtype=jnp.int32))
        all_valid.append(jnp.ones((b, k), dtype=bool))

    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    levels = jnp.concatenate(all_levels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    def per_image(boxes_i, scores_i, levels_i, valid_i, size_i):
        boxes_i = clip_boxes(boxes_i, size_i)
        valid_i = valid_i & nonempty_mask(boxes_i, min_size)
        ob, osc, _, ov = batched_nms_padded(
            boxes_i, scores_i, levels_i, nms_thresh, post_nms_topk, valid=valid_i
        )
        return ob, osc, ov

    pb, ps, pv = jax.vmap(per_image)(boxes, scores, levels, valid, image_sizes)
    return RPNOutput(proposals=pb, scores=ps, valid=pv)

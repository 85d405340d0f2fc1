"""Meta-architectures: GeneralizedRCNN, guide RCNN_FPN_only, AF-extractor.

Parity targets:
  * ``GeneralizedRCNN`` — d2 v0.1.1 meta-arch (backbone → RPN → ROI heads),
    used by every reference inference config.
  * ``RCNN_FPN_only`` — the frozen guide/teacher producing target pyramid
    features (ref: afigan/modeling/meta_arch/rcnn_only.py:34-44).
  * ``GeneralizedRCNN_AFExtractor`` — full RCNN trained on half-res images
    that ALSO returns its pyramid features so the stage-2 trainer can apply
    GAN losses to them (ref: rcnn_extractor.py:41-70). Here this is just
    ``return_features=True`` — the quirk Q1 inference crash of the
    reference (two-arg backbone call) does not exist by construction.

TPU design: images arrive as padded raw-pixel NHWC batches + true sizes;
normalization happens in-model (pixel_mean/std as constants, matching the
checkpoint's expected input distribution). All anchor grids are computed
at trace time from static feature shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import Box2BoxTransform, Matcher
from ..ops.anchors import AnchorGenerator
from .rpn import RPNHead, generate_proposals, label_anchors, rpn_losses
from .roi_heads import GroundTruth, StandardROIHeads
from .cascade_roi_heads import CascadeROIHeads

Dtype = Any


def _rpn_forward(m: nn.Module, features, image_sizes, gt):
    """Shared RPN block for GeneralizedRCNN and ProposalNetwork (both
    carry identical rpn_* fields and the same 'proposal_generator' child
    name, so the param trees stay interchangeable).

    Returns (proposals, losses): losses is None in inference, else the
    rpn_loss_weight-scaled dict. Submodule creation inside this helper
    binds to the caller's compact scope (flax tracks the module context
    dynamically), so checkpoints are unaffected by the refactor.
    """
    rpn_feats = [features[f] for f in m.rpn_in_features]
    feature_shapes = [(f.shape[1], f.shape[2]) for f in rpn_feats]
    gen = AnchorGenerator(
        sizes=[list(s) for s in m.anchor_sizes],
        aspect_ratios=[list(a) for a in m.anchor_aspect_ratios],
        strides=list(m.rpn_strides),
        offset=m.anchor_offset,
    )
    anchors_per_level = gen(feature_shapes)
    num_anchors = gen.num_anchors_per_location[0]

    rpn_head = RPNHead(num_anchors=num_anchors, conv_dim=m.rpn_conv_dim,
                       dtype=m.dtype, name="proposal_generator")
    logits_l, deltas_l = rpn_head(rpn_feats)

    box2box = Box2BoxTransform(m.rpn_bbox_reg_weights)
    proposals = generate_proposals(
        anchors_per_level, logits_l, deltas_l, image_sizes, box2box,
        m.pre_nms_topk, m.post_nms_topk, m.rpn_nms_thresh,
        m.rpn_min_size, approx_topk=m.rpn_approx_topk,
    )
    if not m.train:
        return proposals, None

    assert gt is not None
    anchors = jnp.concatenate(anchors_per_level, axis=0)
    flat_logits = jnp.concatenate(
        [l.reshape(l.shape[0], -1) for l in logits_l], axis=1
    )
    flat_deltas = jnp.concatenate(
        [d.reshape(d.shape[0], -1, 4) for d in deltas_l], axis=1
    )
    key = m.make_rng("sampling")
    keys = jax.random.split(key, gt.boxes.shape[0])
    matcher = Matcher(
        list(m.rpn_iou_thresholds), [0, -1, 1],
        allow_low_quality_matches=True,
    )
    labels, matched_idx = jax.vmap(
        lambda k, gb, gv: label_anchors(
            k, anchors, gb, gv, m.rpn_batch_size_per_image,
            m.rpn_positive_fraction, matcher,
        )
    )(keys, gt.boxes, gt.valid)
    losses = rpn_losses(
        labels, matched_idx, gt.boxes, anchors, flat_logits,
        flat_deltas, box2box, m.rpn_batch_size_per_image,
        m.rpn_smooth_l1_beta,
    )
    return proposals, {k: v * m.rpn_loss_weight for k, v in losses.items()}


class GeneralizedRCNN(nn.Module):
    """backbone (flax module) + RPN + ROI heads, config-driven."""

    backbone: nn.Module
    roi_heads: nn.Module
    # rpn config
    rpn_in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    rpn_strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    anchor_aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),)
    anchor_offset: float = 0.0
    rpn_conv_dim: int = 256
    rpn_iou_thresholds: Sequence[float] = (0.3, 0.7)
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    rpn_smooth_l1_beta: float = 0.0
    rpn_loss_weight: float = 1.0
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    rpn_approx_topk: bool = False  # TPU.APPROX_TOPK (training steps only)
    # preprocessing
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    train: bool = False
    return_features: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) raw pixels, padded
        image_sizes: jnp.ndarray,  # (B, 2)
        gt: Optional[GroundTruth] = None,
        given_dets=None,  # TTA: run only the mask branch on these boxes
    ):
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std

        features = self.backbone(x.astype(self.dtype))

        proposals, rpn_loss = _rpn_forward(self, features, image_sizes, gt)

        if self.train:
            losses = dict(rpn_loss)
            losses.update(self.roi_heads(features, proposals, image_sizes, gt))
            if self.return_features:
                return losses, features
            return losses

        dets, masks = self.roi_heads(
            features, proposals, image_sizes, given_dets=given_dets
        )
        if self.return_features:
            return (dets, masks), features
        return dets, masks


class ProposalNetwork(nn.Module):
    """Backbone + RPN only — d2's ``ProposalNetwork`` meta-arch, the
    surface behind the reference evaluator's first-class "proposals"
    task (ref afigan/evaluation/coco_evaluation.py:145-191,366-474).

    Inference returns the RPNOutput (fixed post_nms_topk proposals +
    objectness scores + validity); training returns the RPN losses.
    """

    backbone: nn.Module
    rpn_in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    rpn_strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    anchor_aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),)
    anchor_offset: float = 0.0
    rpn_conv_dim: int = 256
    rpn_iou_thresholds: Sequence[float] = (0.3, 0.7)
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    rpn_smooth_l1_beta: float = 0.0
    rpn_loss_weight: float = 1.0
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    rpn_approx_topk: bool = False  # TPU.APPROX_TOPK (training steps only)
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, image_sizes, gt: Optional[GroundTruth] = None):
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        features = self.backbone(x.astype(self.dtype))

        proposals, rpn_loss = _rpn_forward(self, features, image_sizes, gt)
        if not self.train:
            return proposals
        return rpn_loss


class RCNN_FPN_only(nn.Module):
    """Backbone-only guide model: images -> pyramid features p2..p6.

    (ref: rcnn_only.py:34-44 — the frozen teacher of stages 1-2.)
    """

    backbone: nn.Module
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        return self.backbone(x.astype(self.dtype))

"""ROI heads (Standard + Cascade) — d2 semantics, fixed-shape TPU design.

Orchestrates proposal↔GT matching and sampling (d2 v0.1.1
label_and_sample_proposals: Matcher([0.5]), 512 rois/img @ 25% positive,
PROPOSAL_APPEND_GT), multi-level ROIAlign pooling (ops/roi_align.py's
single-gather pooler), the Fast R-CNN box branch and the Mask R-CNN mask
branch. Everything is padded/masked: 512 sampled rois, a fixed 128-roi
foreground capacity for the mask branch, fixed 100-detection output.

CascadeROIHeads mirrors d2's 3-stage cascade (IoUs .5/.6/.7, per-stage
box2box weights, class-agnostic regression, mean class scores across
stages — d2 cascade_rcnn.py), used by the reference's
Cascade R-CNN S-101/Swin configs.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    Box2BoxTransform,
    Matcher,
    multilevel_roi_align,
    pairwise_iou,
    subsample_labels,
)
from ..ops.roi_align import (
    multilevel_roi_align_fast,
    multilevel_roi_align_pallas,
    multilevel_roi_align_windowed,
)
from .box_head import (
    Detections,
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
    fast_rcnn_inference_single,
    fast_rcnn_losses,
)
from .mask_head import MaskRCNNConvUpsampleHead, crop_and_resize_masks, mask_loss
from .rpn import RPNOutput

Dtype = Any


class GroundTruth(NamedTuple):
    boxes: jnp.ndarray  # (B, M, 4)
    classes: jnp.ndarray  # (B, M) int32 in [0, C)
    valid: jnp.ndarray  # (B, M) bool
    masks: Optional[jnp.ndarray] = None  # (B, M, MH, MW) float canvases
    keypoints: Optional[jnp.ndarray] = None  # (B, M, K, 3) [x, y, vis]


class SampledProposals(NamedTuple):
    boxes: jnp.ndarray  # (B, S, 4)
    gt_classes: jnp.ndarray  # (B, S) in [0, C] (C = bg)
    gt_idx: jnp.ndarray  # (B, S) matched gt row
    valid: jnp.ndarray  # (B, S)


def sample_proposals_single(
    key: jax.Array,
    prop_boxes: jnp.ndarray,  # (K, 4)
    prop_valid: jnp.ndarray,  # (K,)
    gt: GroundTruth,  # single-image slices (M, ...)
    num_samples: int,
    positive_fraction: float,
    matcher: Matcher,
    num_classes: int,
    append_gt: bool = True,
) -> SampledProposals:
    if append_gt:
        prop_boxes = jnp.concatenate([prop_boxes, gt.boxes], axis=0)
        prop_valid = jnp.concatenate([prop_valid, gt.valid], axis=0)

    iou = pairwise_iou(gt.boxes, prop_boxes)  # (M, K')
    matched_idx, match_labels = matcher(iou, gt.valid)

    gt_classes = jnp.where(
        match_labels == 1, gt.classes[matched_idx], num_classes
    )
    # invalid proposals can never be sampled
    sample_labels = jnp.where(prop_valid, match_labels.astype(jnp.int32), -1)
    # fg label for sampling: 1 where matched, 0 bg
    idx, valid = subsample_labels(
        key, sample_labels, num_samples, positive_fraction, bg_label=0
    )
    return SampledProposals(
        boxes=prop_boxes[idx],
        gt_classes=jnp.where(valid, gt_classes[idx], num_classes),
        gt_idx=matched_idx[idx],
        valid=valid,
    )


class StandardROIHeads(nn.Module):
    """Box (+ optional mask) heads over FPN features p2..p5."""

    num_classes: int = 80
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    strides: Sequence[int] = (4, 8, 16, 32)
    # box branch
    box_pooler_resolution: int = 7
    box_num_conv: int = 0
    box_conv_dim: int = 256
    box_num_fc: int = 2
    box_fc_dim: int = 1024
    box_norm: str = ""
    bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    cls_agnostic_bbox_reg: bool = False
    # mask branch
    mask_on: bool = False
    mask_pooler_resolution: int = 14
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_norm: str = ""
    cls_agnostic_mask: bool = False
    # keypoint branch (d2 KRCNNConvDeconvUpsampleHead, MODEL.KEYPOINT_ON)
    keypoint_on: bool = False
    keypoint_pooler_resolution: int = 14
    keypoint_conv_dims: Tuple[int, ...] = (512,) * 8
    num_keypoints: int = 17
    keypoint_loss_weight: float = 1.0
    keypoint_normalize_by_visible: bool = True
    # ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO / POOLER_TYPE (d2 lets the
    # keypoint branch pool differently from the box branch)
    keypoint_sampling_ratio: int = 2
    keypoint_aligned: bool = True
    # sampling
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_threshold: float = 0.5
    append_gt: bool = True
    # inference
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    # pooling
    sampling_ratio: int = 2
    aligned: bool = True  # POOLER_TYPE ROIAlignV2
    # "pallas": fused window-DMA + MXU kernel fwd, dense-matmul bwd;
    # "fast": windowed-matmul forward + point-scatter custom-VJP backward;
    # "windowed": autodiff through the windowed form; "gather":
    # per-sample-point gather (reference form)
    pooler_impl: str = "pallas"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _pool(self, features, boxes, resolution, sampling_ratio=None,
              aligned=None):
        """features: dict of (B,H,W,C); boxes (B,R,4) -> (B,R,P,P,C)."""
        feats = [features[f] for f in self.in_features]
        sr = self.sampling_ratio if sampling_ratio is None else sampling_ratio
        al = self.aligned if aligned is None else aligned
        from ..ops.roi_align import pallas_pooler_supported

        impl_name = self.pooler_impl
        if impl_name == "pallas" and not pallas_pooler_supported(
            feats[0].shape[-1]
        ):
            impl_name = "fast"  # e.g. BiFPN's 160-ch pyramid (see helper)
        if impl_name == "pallas":
            return multilevel_roi_align_pallas(
                tuple(feats), boxes, tuple(self.strides), resolution, sr, al,
            )
        if impl_name == "fast":
            return jax.vmap(lambda *a: multilevel_roi_align_fast(
                tuple(a[:-1]), a[-1], tuple(self.strides), resolution, sr, al,
            ))(*feats, boxes)
        impl = (
            multilevel_roi_align_windowed
            if impl_name == "windowed"
            else multilevel_roi_align
        )
        return jax.vmap(lambda *a: impl(
            list(a[:-1]), a[-1], list(self.strides), resolution, sr, al,
        ))(*feats, boxes)

    def _box_head(self):
        head = FastRCNNConvFCHead(
            num_conv=self.box_num_conv, conv_dim=self.box_conv_dim,
            num_fc=self.box_num_fc, fc_dim=self.box_fc_dim,
            norm=self.box_norm, train=self.train, axis_name=self.axis_name,
            dtype=self.dtype, name="box_head",
        )
        pred = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            dtype=self.dtype, name="box_predictor",
        )
        return head, pred

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: RPNOutput,
        image_sizes: jnp.ndarray,
        gt: Optional[GroundTruth] = None,
        given_dets: Optional[Detections] = None,
    ):
        # mask-on-given-boxes path (TTA: masks from merged boxes, d2
        # GeneralizedRCNNWithTTA _rescale_detected_boxes semantics)
        if not self.train and given_dets is not None:
            # masks only: the TTA caller averages mask probabilities over
            # merged boxes and never reads keypoints (d2 TTA has no
            # keypoint support — GeneralizedRCNNWithTTA asserts it off),
            # so running the 8-conv keypoint head here would be waste.
            masks = self._mask_branch_infer(features, given_dets) if self.mask_on else None
            return given_dets, masks

        box2box = Box2BoxTransform(self.bbox_reg_weights)
        box_head, box_pred = self._box_head()

        if self.train:
            assert gt is not None
            key = self.make_rng("sampling")
            keys = jax.random.split(key, proposals.proposals.shape[0])
            sampled = jax.vmap(
                lambda k, pb, pv, gb, gc, gv: sample_proposals_single(
                    k, pb, pv, GroundTruth(gb, gc, gv), self.batch_size_per_image,
                    self.positive_fraction,
                    Matcher([self.iou_threshold], [0, 1]),
                    self.num_classes, self.append_gt,
                )
            )(keys, jax.lax.stop_gradient(proposals.proposals), proposals.valid,
              gt.boxes, gt.classes, gt.valid)

            b, s = sampled.gt_classes.shape
            pooled = self._pool(features, sampled.boxes, self.box_pooler_resolution)
            flat = pooled.reshape(b * s, *pooled.shape[2:])
            box_feats = box_head(flat)
            logits, deltas = box_pred(box_feats)

            matched_gt_boxes = jnp.take_along_axis(
                gt.boxes, sampled.gt_idx[..., None], axis=1
            )
            gt_deltas = box2box.get_deltas(sampled.boxes, matched_gt_boxes)
            losses = fast_rcnn_losses(
                logits, deltas,
                sampled.gt_classes.reshape(-1),
                gt_deltas.reshape(-1, 4),
                sampled.valid.reshape(-1),
                self.num_classes, self.smooth_l1_beta,
            )

            if self.mask_on:
                losses["loss_mask"] = self._mask_branch_train(
                    features, sampled, gt
                )
            if self.keypoint_on:
                losses["loss_keypoint"] = self._keypoint_branch_train(
                    features, sampled, gt
                )
            # diagnostic (excluded from total_loss by the stage steps):
            # sampled-foreground fraction — the fg-gated losses scale
            # with this mixture, which rises while the RPN warms up
            fg = (sampled.gt_classes < self.num_classes) & sampled.valid
            losses["diag_fg_frac"] = jnp.mean(fg.astype(jnp.float32))
            return losses

        # ---------------- inference ----------------
        b, k = proposals.scores.shape
        pooled = self._pool(features, proposals.proposals, self.box_pooler_resolution)
        flat = pooled.reshape(b * k, *pooled.shape[2:])
        logits, deltas = box_pred(box_head(flat))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, -1)
        deltas = deltas.astype(jnp.float32).reshape(b, k, -1)
        boxes = box2box.apply_deltas(
            deltas, proposals.proposals
        ).reshape(b, k, -1, 4)

        dets = jax.vmap(
            lambda bx, sc, sz, pv: fast_rcnn_inference_single(
                bx, sc, sz, pv, self.score_thresh, self.nms_thresh,
                self.detections_per_image,
            )
        )(boxes, probs, image_sizes, proposals.valid)

        masks = None
        if self.mask_on:
            masks = self._mask_branch_infer(features, dets)
        if self.keypoint_on:
            dets = dets._replace(
                keypoints=self._keypoint_branch_infer(features, dets)
            )
        return dets, masks

    # ------------------------------------------------------------------
    def _mask_head(self):
        return MaskRCNNConvUpsampleHead(
            num_classes=self.num_classes, num_conv=self.mask_num_conv,
            conv_dim=self.mask_conv_dim, norm=self.mask_norm,
            cls_agnostic=self.cls_agnostic_mask, train=self.train,
            axis_name=self.axis_name, dtype=self.dtype, name="mask_head",
        )

    def _select_fg(self, sampled: SampledProposals):
        """Top-k compaction of foreground rows to a fixed capacity
        (shared by the mask and keypoint branches)."""
        max_fg = max(1, int(self.batch_size_per_image * self.positive_fraction))
        fg = sampled.valid & (sampled.gt_classes < self.num_classes)
        _, fg_idx = jax.lax.top_k(fg.astype(jnp.int32), max_fg)
        fg_valid = jnp.take_along_axis(fg, fg_idx, axis=1)
        fg_boxes = jnp.take_along_axis(sampled.boxes, fg_idx[..., None], axis=1)
        fg_classes = jnp.take_along_axis(sampled.gt_classes, fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled.gt_idx, fg_idx, axis=1)
        return max_fg, fg_boxes, fg_classes, fg_gt_idx, fg_valid

    def _mask_branch_train(self, features, sampled: SampledProposals, gt: GroundTruth):
        """Foreground-only mask branch with a fixed fg capacity."""
        b, s = sampled.gt_classes.shape
        max_fg, fg_boxes, fg_classes, fg_gt_idx, fg_valid = self._select_fg(sampled)

        pooled = self._pool(features, fg_boxes, self.mask_pooler_resolution)
        flat = pooled.reshape(b * max_fg, *pooled.shape[2:])
        mask_logits = self._mask_head()(flat)
        out_size = mask_logits.shape[1]

        targets = jax.vmap(
            lambda gm, gb, rb, gi: crop_and_resize_masks(gm, gb, rb, gi, out_size)
        )(gt.masks, gt.boxes, fg_boxes, fg_gt_idx)

        return mask_loss(
            mask_logits, targets.reshape(b * max_fg, out_size, out_size),
            fg_classes.reshape(-1), fg_valid.reshape(-1), self.num_classes,
        )

    def _keypoint_head(self):
        from .keypoint_head import KRCNNConvDeconvUpsampleHead

        return KRCNNConvDeconvUpsampleHead(
            num_keypoints=self.num_keypoints,
            conv_dims=tuple(self.keypoint_conv_dims),
            train=self.train, dtype=self.dtype, name="keypoint_head",
        )

    def _keypoint_branch_train(self, features, sampled: SampledProposals,
                               gt: GroundTruth):
        """Foreground keypoint branch (d2 keypoint_rcnn_loss). The d2
        extra filter `select_proposals_with_visible_keypoints` is folded
        into the loss's visibility mask (fixed shapes on TPU)."""
        from .keypoint_head import keypoint_rcnn_loss

        assert gt.keypoints is not None, "KEYPOINT_ON requires gt.keypoints"
        b, s = sampled.gt_classes.shape
        max_fg, fg_boxes, fg_classes, fg_gt_idx, fg_valid = self._select_fg(sampled)

        pooled = self._pool(features, fg_boxes, self.keypoint_pooler_resolution,
                            self.keypoint_sampling_ratio, self.keypoint_aligned)
        flat = pooled.reshape(b * max_fg, *pooled.shape[2:])
        logits = self._keypoint_head()(flat)

        gt_kp = jax.vmap(lambda kp, gi: kp[gi])(gt.keypoints, fg_gt_idx)
        return keypoint_rcnn_loss(
            logits,
            gt_kp.reshape(b * max_fg, self.num_keypoints, 3),
            fg_boxes.reshape(b * max_fg, 4),
            fg_valid.reshape(-1),
            self.keypoint_normalize_by_visible,
            self.keypoint_loss_weight,
            # d2's flag-off constant: num_images * batch_size_per_image *
            # positive_fraction (== b * max_fg)
            normalizer=float(b * max_fg),
        )

    def _keypoint_branch_infer(self, features, dets: Detections):
        from .keypoint_head import heatmaps_to_keypoints

        b, d = dets.scores.shape
        pooled = self._pool(features, dets.boxes, self.keypoint_pooler_resolution,
                            self.keypoint_sampling_ratio, self.keypoint_aligned)
        flat = pooled.reshape(b * d, *pooled.shape[2:])
        logits = self._keypoint_head()(flat)
        kp = heatmaps_to_keypoints(logits, dets.boxes.reshape(b * d, 4))
        return kp.reshape(b, d, self.num_keypoints, 3)

    def _mask_branch_infer(self, features, dets: Detections):
        b, d = dets.scores.shape
        pooled = self._pool(features, dets.boxes, self.mask_pooler_resolution)
        flat = pooled.reshape(b * d, *pooled.shape[2:])
        mask_logits = self._mask_head()(flat)
        s = mask_logits.shape[1]
        mask_logits = mask_logits.reshape(b, d, s, s, -1)
        if mask_logits.shape[-1] == 1:
            sel = mask_logits[..., 0]
        else:
            cls_idx = jnp.clip(dets.classes, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, cls_idx[..., None, None, None], axis=-1
            )[..., 0]
        return jax.nn.sigmoid(sel.astype(jnp.float32))  # (B, D, S, S)

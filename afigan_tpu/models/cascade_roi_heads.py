"""Cascade R-CNN ROI heads — d2 v0.1.1 CascadeROIHeads semantics.

Used by the reference's flagship configs (Cascade R-CNN S-101-PAFPN /
Swin-BiFPN, configs/inference/*.yaml ROI_HEADS.NAME: CascadeROIHeads):
3 box stages with increasing IoU thresholds (.5/.6/.7), per-stage box2box
weights ((10,10,5,5)/(20,20,10,10)/(30,30,15,15)), class-agnostic
regression, each stage refining the previous stage's boxes. At inference
the class scores are the MEAN of the per-stage softmax probabilities
(d2 cascade_rcnn.py _forward_box); the mask branch rides on the stage-0
sampled proposals at train time and on the final detections at inference,
exactly like StandardROIHeads.

Fixed-shape notes: training stages 1-2 re-match ALL 512 carried proposals
(no re-subsampling — d2 parity), with per-stage losses divided by the
carried proposal count.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import Box2BoxTransform, Matcher, clip_boxes, pairwise_iou
from .box_head import (
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
    fast_rcnn_inference_single,
    fast_rcnn_losses,
)
from .roi_heads import StandardROIHeads, GroundTruth, sample_proposals_single
from .rpn import RPNOutput

Dtype = Any


class CascadeROIHeads(StandardROIHeads):
    """3-stage cascade; inherits pooling/mask machinery from StandardROIHeads."""

    cascade_ious: Sequence[float] = (0.5, 0.6, 0.7)
    cascade_bbox_reg_weights: Sequence[Sequence[float]] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )

    def _stage_heads(self, stage: int):
        head = FastRCNNConvFCHead(
            num_conv=self.box_num_conv, conv_dim=self.box_conv_dim,
            num_fc=self.box_num_fc, fc_dim=self.box_fc_dim,
            norm=self.box_norm, train=self.train, axis_name=self.axis_name,
            dtype=self.dtype, name=f"box_head_{stage}",
        )
        pred = FastRCNNOutputLayers(
            num_classes=self.num_classes, cls_agnostic_bbox_reg=True,
            dtype=self.dtype, name=f"box_predictor_{stage}",
        )
        return head, pred

    def _run_stage(self, features, boxes, stage):
        """boxes (B,S,4) -> (logits (B*S,C+1), deltas (B*S,4))."""
        b, s = boxes.shape[:2]
        pooled = self._pool(features, boxes, self.box_pooler_resolution)
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        head, pred = self._stage_heads(stage)
        return pred(head(flat))

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: RPNOutput,
        image_sizes: jnp.ndarray,
        gt: Optional[GroundTruth] = None,
        given_dets=None,
    ):
        if not self.train and given_dets is not None:
            # masks only, like StandardROIHeads: the TTA caller never
            # reads keypoints (and asserts KEYPOINT_ON off)
            masks = self._mask_branch_infer(features, given_dets) if self.mask_on else None
            return given_dets, masks

        num_stages = len(self.cascade_ious)

        if self.train:
            assert gt is not None
            key = self.make_rng("sampling")
            keys = jax.random.split(key, proposals.proposals.shape[0])
            sampled = jax.vmap(
                lambda k, pb, pv, gb, gc, gv: sample_proposals_single(
                    k, pb, pv, GroundTruth(gb, gc, gv), self.batch_size_per_image,
                    self.positive_fraction,
                    Matcher([self.cascade_ious[0]], [0, 1]),
                    self.num_classes, self.append_gt,
                )
            )(keys, jax.lax.stop_gradient(proposals.proposals), proposals.valid,
              gt.boxes, gt.classes, gt.valid)

            losses: Dict[str, jnp.ndarray] = {}
            boxes = sampled.boxes
            gt_classes = sampled.gt_classes
            gt_idx = sampled.gt_idx
            valid = sampled.valid
            b, s = gt_classes.shape

            for stage in range(num_stages):
                box2box = Box2BoxTransform(self.cascade_bbox_reg_weights[stage])
                if stage > 0:
                    # re-match carried boxes at the tighter IoU (d2
                    # _match_and_label_boxes: no subsampling)
                    matcher = Matcher([self.cascade_ious[stage]], [0, 1])

                    def rematch(bx, gb, gc, gv):
                        iou = pairwise_iou(gb, bx)
                        midx, mlab = matcher(iou, gv)
                        cls = jnp.where(mlab == 1, gc[midx], self.num_classes)
                        return cls, midx

                    gt_classes, gt_idx = jax.vmap(rematch)(
                        boxes, gt.boxes, gt.classes, gt.valid
                    )
                    gt_classes = jnp.where(valid, gt_classes, self.num_classes)

                # diagnostic (excluded from total_loss by the stage
                # steps): fraction of sampled proposals that are
                # foreground at this cascade stage's IoU — the fg-gated
                # losses (box_reg, later-stage cls) scale with this
                # mixture, which RISES while the RPN/stage-(k-1) boxes
                # improve (observed on-chip: DYNVAL_r05_s101*)
                fg = (gt_classes < self.num_classes) & valid
                losses[f"diag_fg_frac_stage{stage}"] = jnp.mean(
                    fg.astype(jnp.float32))

                logits, deltas = self._run_stage(features, boxes, stage)
                matched_gt_boxes = jnp.take_along_axis(
                    gt.boxes, gt_idx[..., None], axis=1
                )
                gt_deltas = box2box.get_deltas(boxes, matched_gt_boxes)
                stage_losses = fast_rcnn_losses(
                    logits, deltas, gt_classes.reshape(-1),
                    gt_deltas.reshape(-1, 4), valid.reshape(-1),
                    self.num_classes, self.smooth_l1_beta,
                )
                losses.update(
                    {f"{k}_stage{stage}": v for k, v in stage_losses.items()}
                )

                if stage < num_stages - 1:
                    new_boxes = box2box.apply_deltas(
                        jax.lax.stop_gradient(deltas.astype(jnp.float32)).reshape(b, s, 4),
                        boxes,
                    )
                    boxes = jax.vmap(clip_boxes)(new_boxes, image_sizes)

            if self.mask_on:
                losses["loss_mask"] = self._mask_branch_train(features, sampled, gt)
            if self.keypoint_on:
                losses["loss_keypoint"] = self._keypoint_branch_train(
                    features, sampled, gt
                )
            return losses

        # ---------------- inference ----------------
        b, k = proposals.scores.shape
        boxes = proposals.proposals
        all_probs = []
        for stage in range(num_stages):
            box2box = Box2BoxTransform(self.cascade_bbox_reg_weights[stage])
            logits, deltas = self._run_stage(features, boxes, stage)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(b, k, -1)
            all_probs.append(probs)
            new_boxes = box2box.apply_deltas(
                deltas.astype(jnp.float32).reshape(b, k, 4), boxes
            )
            boxes = jax.vmap(clip_boxes)(new_boxes, image_sizes)

        mean_probs = sum(all_probs) / num_stages
        dets = jax.vmap(
            lambda bx, sc, sz, pv: fast_rcnn_inference_single(
                bx[:, None, :], sc, sz, pv, self.score_thresh, self.nms_thresh,
                self.detections_per_image,
            )
        )(boxes, mean_probs, image_sizes, proposals.valid)

        masks = None
        if self.mask_on:
            masks = self._mask_branch_infer(features, dets)
        if self.keypoint_on:
            dets = dets._replace(
                keypoints=self._keypoint_branch_infer(features, dets)
            )
        return dets, masks

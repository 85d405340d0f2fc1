"""Res5ROIHeads — d2's C4 ROI heads (the d2 default config's head).

Not used by any reference config (all use FPN + StandardROIHeads), but
it is the d2 default (MODEL.ROI_HEADS.NAME: Res5ROIHeads) and completes
the inherited-surface inventory: ROIAlign on res4 at 14x14, the ResNet
res5 stage applied INSIDE the head (stride 2 → 7x7x2048), global average
pool → linear cls/box predictors; the mask head shares the res5 output.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import Box2BoxTransform, Matcher
from ..ops.roi_align import multilevel_roi_align_fast
from .box_head import (
    Detections,
    FastRCNNOutputLayers,
    fast_rcnn_inference_single,
    fast_rcnn_losses,
)
from .mask_head import crop_and_resize_masks, mask_loss
from .layers import Conv, ConvTranspose, c2_msra_fill
from .resnet import BottleneckBlock
from .roi_heads import GroundTruth, sample_proposals_single
from .rpn import RPNOutput

Dtype = Any


class Res5ROIHeads(nn.Module):
    num_classes: int = 80
    in_feature: str = "res4"
    stride: int = 16
    pooler_resolution: int = 14
    res5_out_channels: int = 2048
    res5_bottleneck_channels: int = 512
    norm: str = "FrozenBN"
    num_res5_blocks: int = 3
    stride_in_1x1: bool = True
    mask_on: bool = False
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_threshold: float = 0.5
    append_gt: bool = True
    bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def _res5_blocks(self):
        return [
            BottleneckBlock(
                out_channels=self.res5_out_channels,
                bottleneck_channels=self.res5_bottleneck_channels,
                stride=2 if b == 0 else 1,
                norm=self.norm,
                stride_in_1x1=self.stride_in_1x1,
                train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                name=f"res5/block{b}",
            )
            for b in range(self.num_res5_blocks)
        ]

    def _pool(self, feature, boxes):
        return jax.vmap(
            lambda f, bx: multilevel_roi_align_fast(
                (f,), bx, (self.stride,), self.pooler_resolution, 2, True
            )
        )(feature, boxes)

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: RPNOutput,
        image_sizes: jnp.ndarray,
        gt: Optional[GroundTruth] = None,
        given_dets=None,
    ):
        feature = features[self.in_feature]
        box2box = Box2BoxTransform(self.bbox_reg_weights)
        predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="box_predictor"
        )

        res5_blocks = self._res5_blocks()  # declared once, reused per call

        def shared(boxes):
            b, r = boxes.shape[:2]
            pooled = self._pool(feature, boxes)
            x = pooled.reshape(b * r, *pooled.shape[2:]).astype(self.dtype)
            for blk in res5_blocks:
                x = blk(x)
            return x  # (B*R, 7, 7, 2048)

        if not self.train and given_dets is not None:
            masks = None
            if self.mask_on:
                x = shared(given_dets.boxes)
                masks = self._mask_logits_to_probs(
                    self._mask_head(x), given_dets
                )
            return given_dets, masks

        if self.train:
            assert gt is not None
            key = self.make_rng("sampling")
            keys = jax.random.split(key, proposals.proposals.shape[0])
            sampled = jax.vmap(
                lambda k, pb, pv, gb, gc, gv: sample_proposals_single(
                    k, pb, pv, GroundTruth(gb, gc, gv), self.batch_size_per_image,
                    self.positive_fraction, Matcher([self.iou_threshold], [0, 1]),
                    self.num_classes, self.append_gt,
                )
            )(keys, jax.lax.stop_gradient(proposals.proposals), proposals.valid,
              gt.boxes, gt.classes, gt.valid)
            b, s = sampled.gt_classes.shape
            x = shared(sampled.boxes)
            box_feats = jnp.mean(x, axis=(1, 2))
            logits, deltas = predictor(box_feats)
            matched_gt_boxes = jnp.take_along_axis(
                gt.boxes, sampled.gt_idx[..., None], axis=1
            )
            gt_deltas = box2box.get_deltas(sampled.boxes, matched_gt_boxes)
            losses = fast_rcnn_losses(
                logits, deltas, sampled.gt_classes.reshape(-1),
                gt_deltas.reshape(-1, 4), sampled.valid.reshape(-1),
                self.num_classes, self.smooth_l1_beta,
            )
            if self.mask_on:
                fg = sampled.valid & (sampled.gt_classes < self.num_classes)
                mask_logits = self._mask_head(x)
                out_size = mask_logits.shape[1]
                targets = jax.vmap(
                    lambda gm, gb, rb, gi: crop_and_resize_masks(gm, gb, rb, gi, out_size)
                )(gt.masks, gt.boxes, sampled.boxes, sampled.gt_idx)
                losses["loss_mask"] = mask_loss(
                    mask_logits, targets.reshape(b * s, out_size, out_size),
                    sampled.gt_classes.reshape(-1), fg.reshape(-1),
                    self.num_classes,
                )
            return losses

        # inference
        b, k = proposals.scores.shape
        x = shared(proposals.proposals)
        box_feats = jnp.mean(x, axis=(1, 2))
        logits, deltas = predictor(box_feats)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(b, k, -1)
        boxes = box2box.apply_deltas(
            deltas.astype(jnp.float32).reshape(b, k, -1), proposals.proposals
        ).reshape(b, k, -1, 4)
        dets = jax.vmap(
            lambda bx, sc, sz, pv: fast_rcnn_inference_single(
                bx, sc, sz, pv, self.score_thresh, self.nms_thresh,
                self.detections_per_image,
            )
        )(boxes, probs, image_sizes, proposals.valid)

        masks = None
        if self.mask_on:
            xm = shared(dets.boxes)
            masks = self._mask_logits_to_probs(self._mask_head(xm), dets)
        return dets, masks

    def _mask_head(self, x):
        """d2 C4 mask head: deconv + 1x1 predictor on res5 output."""
        y = ConvTranspose(256, kernel_size=2, stride=2, padding=0,
                          kernel_init=c2_msra_fill(), dtype=self.dtype,
                          name="mask_deconv")(x)
        y = jax.nn.relu(y)
        return Conv(self.num_classes, 1, padding=0,
                    kernel_init=nn.initializers.normal(0.001),
                    dtype=self.dtype, name="mask_predictor")(y)

    def _mask_logits_to_probs(self, mask_logits, dets: Detections):
        s = mask_logits.shape[1]
        b, d = dets.scores.shape
        ml = mask_logits.reshape(b, d, s, s, -1)
        cls_idx = jnp.clip(dets.classes, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(ml, cls_idx[..., None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(sel.astype(jnp.float32))

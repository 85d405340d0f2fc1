"""FCOS — anchor-free one-stage detection head, TPU-native fixed shapes.

The reference's FCOS rows (README table, BASELINE.json config #3 "FCOS
R-50-BiFPN") were produced with the external AdelaiDet codebase
(ref README.md:156-163); here FCOS is a first-class citizen built from
its published algorithm:
  * shared 4-conv (GN) class/box towers over P3-P7, per-level learnable
    scale on box regression, centerness branch on the box tower
  * target assignment: a location on level l is positive for the smallest
    GT box that (a) contains it (center-sampling radius 1.5·stride) and
    (b) whose max l/t/r/b distance falls inside the level's
    size-of-interest range
  * losses: sigmoid focal (cls), GIoU (box, centerness-weighted),
    BCE (centerness); all normalized by the (distributed-summed) positive
    count
  * inference: per-level top-k → cross-level class-aware NMS, all padded.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.losses import bce_with_logits

from ..ops import batched_nms_padded, clip_boxes
from .box_head import Detections
from .layers import Conv, get_norm
from .roi_heads import GroundTruth

Dtype = Any

INF = 1e8


class FCOSHead(nn.Module):
    num_classes: int = 80
    num_convs: int = 4
    in_channels: int = 256
    norm: str = "GN"
    prior_prob: float = 0.01
    centerness_on_reg: bool = True
    use_scale: bool = True
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: per-level (B, H, W, C) → (logits, bbox_reg, ctrness) lists."""
        def tower(name):
            convs = []
            for i in range(self.num_convs):
                convs.append(
                    Conv(self.in_channels, 3, padding=1, norm=self.norm,
                         train=self.train, axis_name=self.axis_name,
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name=f"{name}{i}")
                )
            return convs

        cls_tower = tower("cls_tower")
        box_tower = tower("bbox_tower")
        bias_init = float(-np.log((1 - self.prior_prob) / self.prior_prob))
        cls_logits = Conv(self.num_classes, 3, padding=1,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(bias_init),
                          dtype=self.dtype, name="cls_logits")
        bbox_pred = Conv(4, 3, padding=1,
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name="bbox_pred")
        ctrness = Conv(1, 3, padding=1,
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="ctrness")

        logits, regs, ctrs = [], [], []
        for lvl, f in enumerate(features):
            c = f
            for conv in cls_tower:
                c = jax.nn.relu(conv(c))
            b = f
            for conv in box_tower:
                b = jax.nn.relu(conv(b))
            logits.append(cls_logits(c))
            reg = bbox_pred(b)
            if self.use_scale:
                scale = self.param(f"scale_{lvl}", nn.initializers.ones, ())
                reg = reg * scale
            regs.append(jax.nn.relu(reg))  # distances are non-negative
            ctrs.append(ctrness(b if self.centerness_on_reg else c))
        return logits, regs, ctrs


def compute_locations(shapes: Sequence[Tuple[int, int]],
                      strides: Sequence[int]) -> List[jnp.ndarray]:
    """Per-level (H*W, 2) center locations: (x, y) = (i + 0.5) * stride
    shifted by stride//2 per the FCOS convention (stride/2 + i*stride)."""
    out = []
    for (h, w), s in zip(shapes, strides):
        xs = (np.arange(w, dtype=np.float32)) * s + s // 2
        ys = (np.arange(h, dtype=np.float32)) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)
        out.append(jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1)))
    return out


def fcos_targets_single(
    locations: jnp.ndarray,  # (L, 2) all levels concatenated
    level_ranges: jnp.ndarray,  # (L, 2) size-of-interest per location
    loc_strides: jnp.ndarray,  # (L,)
    gt: GroundTruth,  # single image (M, ...)
    center_sample: bool = True,
    pos_radius: float = 1.5,
):
    """Returns (labels (L,), reg_targets (L, 4), matched_gt (L,))."""
    xs, ys = locations[:, 0], locations[:, 1]
    boxes = gt.boxes  # (M, 4)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    l = xs[:, None] - boxes[None, :, 0]
    t = ys[:, None] - boxes[None, :, 1]
    r = boxes[None, :, 2] - xs[:, None]
    b = boxes[None, :, 3] - ys[:, None]
    reg = jnp.stack([l, t, r, b], axis=2)  # (L, M, 4)

    if center_sample:
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        radius = pos_radius * loc_strides[:, None]
        x0 = jnp.maximum(cx[None, :] - radius, boxes[None, :, 0])
        y0 = jnp.maximum(cy[None, :] - radius, boxes[None, :, 1])
        x1 = jnp.minimum(cx[None, :] + radius, boxes[None, :, 2])
        y1 = jnp.minimum(cy[None, :] + radius, boxes[None, :, 3])
        in_box = (
            (xs[:, None] > x0) & (xs[:, None] < x1)
            & (ys[:, None] > y0) & (ys[:, None] < y1)
        )
    else:
        in_box = jnp.min(reg, axis=2) > 0

    max_reg = jnp.max(reg, axis=2)  # (L, M)
    in_level = (max_reg >= level_ranges[:, None, 0]) & (
        max_reg <= level_ranges[:, None, 1]
    )
    candidate = in_box & in_level & gt.valid[None, :]

    cand_areas = jnp.where(candidate, areas[None, :], INF)
    matched = jnp.argmin(cand_areas, axis=1)  # (L,)
    matched_valid = jnp.min(cand_areas, axis=1) < INF

    labels = jnp.where(matched_valid, gt.classes[matched], -1)
    reg_targets = jnp.take_along_axis(
        reg, matched[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    return labels, reg_targets, matched


def _sigmoid_focal(logits, targets_onehot, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return a_t * ((1 - p_t) ** gamma) * ce


def _giou_loss(pred, target):
    """pred/target: (N, 4) l,t,r,b distances."""
    pl, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]
    p_area = (pl + pr) * (pt + pb)
    t_area = (tl + tr) * (tt + tb)
    iw = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = p_area + t_area - inter
    iou = inter / jnp.maximum(union, 1e-7)
    cw = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    ch = jnp.maximum(pt, tt) + jnp.maximum(pb, tb)
    enclose = jnp.maximum(cw * ch, 1e-7)
    giou = iou - (enclose - union) / enclose
    return 1.0 - giou


class FCOS(nn.Module):
    """Full FCOS meta-arch over a pyramid backbone."""

    backbone: nn.Module
    num_classes: int = 80
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    sizes_of_interest: Sequence[int] = (64, 128, 256, 512)
    num_convs: int = 4
    norm: str = "GN"
    prior_prob: float = 0.01
    center_sample: bool = True
    pos_radius: float = 1.5
    centerness_on_reg: bool = True
    use_scale: bool = True
    thresh_with_ctr: bool = False
    score_thresh: float = 0.05
    nms_thresh: float = 0.6
    pre_nms_topk: int = 1000
    post_nms_topk: int = 100
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    # Stage-2 AF-extractor coupling (BASELINE config #3): training
    # forward additionally returns the backbone pyramid so the GAN
    # losses can be applied to it (mirrors GeneralizedRCNN's
    # return_features; ref rcnn_extractor.py:53-70).
    return_features: bool = False

    def _level_ranges(self, num_levels):
        soi = [-1] + list(self.sizes_of_interest) + [INF]
        return [(soi[i], soi[i + 1]) for i in range(num_levels)]

    @nn.compact
    def __call__(self, images, image_sizes, gt: Optional[GroundTruth] = None):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        features = self.backbone(x.astype(self.dtype))
        feats = [features[f] for f in self.in_features]

        head = FCOSHead(
            num_classes=self.num_classes, num_convs=self.num_convs,
            in_channels=feats[0].shape[-1], norm=self.norm,
            prior_prob=self.prior_prob,
            centerness_on_reg=self.centerness_on_reg, use_scale=self.use_scale,
            train=self.train, axis_name=self.axis_name, dtype=self.dtype,
            name="fcos_head",
        )
        logits_l, regs_l, ctrs_l = head(feats)

        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        locations_l = compute_locations(shapes, self.fpn_strides)

        if self.train:
            assert gt is not None
            losses = self._losses(logits_l, regs_l, ctrs_l, locations_l, gt)
            if self.return_features:
                return losses, features
            return losses
        return self._inference(logits_l, regs_l, ctrs_l, locations_l, image_sizes)

    # ------------------------------------------------------------------
    def _losses(self, logits_l, regs_l, ctrs_l, locations_l, gt: GroundTruth):
        num_levels = len(logits_l)
        ranges = self._level_ranges(num_levels)
        locations = jnp.concatenate(locations_l, axis=0)  # (L, 2)
        level_ranges = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.asarray(r, jnp.float32), (loc.shape[0], 2))
                for r, loc in zip(ranges, locations_l)
            ]
        )
        loc_strides = jnp.concatenate(
            [
                jnp.full((loc.shape[0],), s, jnp.float32)
                for s, loc in zip(self.fpn_strides, locations_l)
            ]
        )

        # per-level reg predictions are multiplied by stride for the loss
        # (AdelaiDet normalizes reg by stride; we predict in absolute px
        # via the per-level scale, so targets are used directly)
        b = logits_l[0].shape[0]
        flat_logits = jnp.concatenate(
            [l.reshape(b, -1, self.num_classes) for l in logits_l], axis=1
        ).astype(jnp.float32)
        flat_regs = jnp.concatenate(
            [
                r.reshape(b, -1, 4) * s
                for r, s in zip(regs_l, self.fpn_strides)
            ],
            axis=1,
        ).astype(jnp.float32)
        flat_ctrs = jnp.concatenate(
            [c.reshape(b, -1) for c in ctrs_l], axis=1
        ).astype(jnp.float32)

        labels, reg_targets, _ = jax.vmap(
            lambda gb, gc, gv: fcos_targets_single(
                locations, level_ranges, loc_strides,
                GroundTruth(gb, gc, gv),
                self.center_sample, self.pos_radius,
            )
        )(gt.boxes, gt.classes, gt.valid)

        pos = labels >= 0
        # pmean BEFORE the clamp (AdelaiDet: max(total/num_gpus, 1.0)) —
        # clamping per device first would bias the normalizer up whenever
        # any shard has zero positives
        num_pos = jnp.sum(pos.astype(jnp.float32))
        if self.axis_name:
            num_pos = jax.lax.pmean(num_pos, self.axis_name)
        num_pos = jnp.maximum(num_pos, 1.0)

        onehot = jax.nn.one_hot(jnp.clip(labels, 0), self.num_classes)
        onehot = onehot * pos[..., None]
        cls_loss = jnp.sum(_sigmoid_focal(flat_logits, onehot)) / num_pos

        # centerness targets
        lr = reg_targets[..., [0, 2]]
        tb = reg_targets[..., [1, 3]]
        ctr_t = jnp.sqrt(
            jnp.clip(
                (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-7))
                * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-7)),
                0.0,
            )
        )
        ctr_norm = jnp.sum(jnp.where(pos, ctr_t, 0.0))
        if self.axis_name:
            ctr_norm = jax.lax.pmean(ctr_norm, self.axis_name)
        ctr_norm = jnp.maximum(ctr_norm, 1e-6)  # clamp AFTER the mean

        giou = _giou_loss(
            flat_regs.reshape(-1, 4), reg_targets.reshape(-1, 4)
        ).reshape(pos.shape)
        reg_loss = jnp.sum(jnp.where(pos, giou * ctr_t, 0.0)) / ctr_norm

        ctr_bce = bce_with_logits(flat_ctrs, ctr_t)
        ctr_loss = jnp.sum(jnp.where(pos, ctr_bce, 0.0)) / num_pos

        return {
            "loss_fcos_cls": cls_loss,
            "loss_fcos_loc": reg_loss,
            "loss_fcos_ctr": ctr_loss,
        }

    # ------------------------------------------------------------------
    def _inference(self, logits_l, regs_l, ctrs_l, locations_l, image_sizes):
        b = logits_l[0].shape[0]
        cand_boxes, cand_scores, cand_classes, cand_valid = [], [], [], []
        for logit, reg, ctr, loc, stride in zip(
            logits_l, regs_l, ctrs_l, locations_l, self.fpn_strides
        ):
            scores = jax.nn.sigmoid(
                logit.reshape(b, -1, self.num_classes).astype(jnp.float32)
            )
            ctrness = jax.nn.sigmoid(ctr.reshape(b, -1, 1).astype(jnp.float32))
            if self.thresh_with_ctr:
                scores = scores * ctrness
            flat = (scores if self.thresh_with_ctr else scores * ctrness).reshape(b, -1)
            raw_thresh_ok = scores.reshape(b, -1) > self.score_thresh

            k = min(self.pre_nms_topk, flat.shape[1])
            top_scores, top_idx = jax.lax.top_k(
                jnp.where(raw_thresh_ok, flat, 0.0), k
            )
            loc_idx = top_idx // self.num_classes
            cls_idx = (top_idx % self.num_classes).astype(jnp.int32)

            reg_flat = reg.reshape(b, -1, 4).astype(jnp.float32) * stride
            sel_reg = jnp.take_along_axis(reg_flat, loc_idx[..., None], axis=1)
            sel_loc = loc[loc_idx]  # (b, k, 2)
            boxes = jnp.stack(
                [
                    sel_loc[..., 0] - sel_reg[..., 0],
                    sel_loc[..., 1] - sel_reg[..., 1],
                    sel_loc[..., 0] + sel_reg[..., 2],
                    sel_loc[..., 1] + sel_reg[..., 3],
                ],
                axis=-1,
            )
            cand_boxes.append(boxes)
            cand_scores.append(top_scores)
            cand_classes.append(cls_idx)
            cand_valid.append(top_scores > 0)

        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        classes = jnp.concatenate(cand_classes, axis=1)
        valid = jnp.concatenate(cand_valid, axis=1)

        def per_image(bx, sc, cl, vl, sz):
            bx = clip_boxes(bx, sz)
            ob, osc, oi, ov = batched_nms_padded(
                bx, sc, cl, self.nms_thresh, self.post_nms_topk, valid=vl
            )
            return Detections(
                boxes=ob, scores=jnp.where(ov, osc, 0.0), classes=cl[oi], valid=ov
            )

        dets = jax.vmap(per_image)(boxes, scores, classes, valid, image_sizes)
        return dets, None


def build_fcos(cfg, train: bool = False, axis_name=None,
               return_features: bool = False):
    from .build import build_backbone, _dtype_of

    dtype = _dtype_of(cfg)
    f = cfg.MODEL.FCOS
    backbone = build_backbone(cfg, train=train, axis_name=axis_name, dtype=dtype)
    return FCOS(
        return_features=return_features,
        backbone=backbone,
        num_classes=f.NUM_CLASSES,
        in_features=tuple(f.IN_FEATURES),
        fpn_strides=tuple(f.FPN_STRIDES),
        sizes_of_interest=tuple(f.SIZES_OF_INTEREST),
        num_convs=f.NUM_CONVS,
        norm=f.NORM,
        prior_prob=f.PRIOR_PROB,
        center_sample=f.CENTER_SAMPLE,
        pos_radius=f.POS_RADIUS,
        centerness_on_reg=f.CENTERNESS_ON_REG,
        use_scale=f.USE_SCALE,
        thresh_with_ctr=f.THRESH_WITH_CTR,
        score_thresh=f.INFERENCE_TH_TRAIN if train else f.INFERENCE_TH_TEST,
        nms_thresh=f.NMS_TH,
        pre_nms_topk=f.PRE_NMS_TOPK_TRAIN if train else f.PRE_NMS_TOPK_TEST,
        post_nms_topk=f.POST_NMS_TOPK_TRAIN if train else f.POST_NMS_TOPK_TEST,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        train=train,
        axis_name=axis_name,
        dtype=dtype,
    )

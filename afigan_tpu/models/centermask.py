"""CenterMask — anchor-free instance segmentation (FCOS + SAG-Mask).

The reference's CenterMask rows (README table "CenterMask R-50-BiFPN")
come from the external CenterMask2 codebase (ref README.md:156-163);
here it is a first-class citizen built from the published architecture:
FCOS detection + a spatial-attention-guided (SAG) mask head over ROIs
pooled from P3-P5.

SAG-Mask head: 4 convs → spatial attention module (channel avg+max pool
→ 3x3 conv → sigmoid gate) → 2x2 deconv → per-class 1x1 predictor.

Training (CenterMask2 protocol, exact): the mask branch trains on the
FCOS head's own proposals — its decoded post-NMS detections during the
same step (stop-grad boxes), GT-appended, matched to GT at IoU 0.5 and
subsampled to a fixed fg capacity (TPU static shapes); mask targets are
cropped to the sampled proposal windows (Mask R-CNN semantics).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.roi_align import multilevel_roi_align_pallas
from .box_head import Detections
from .fcos import FCOS, build_fcos
from .layers import Conv, ConvTranspose, c2_msra_fill
from .mask_head import crop_and_resize_masks, mask_loss
from .roi_heads import GroundTruth

Dtype = Any


class SpatialAttention(nn.Module):
    """SAM: sigmoid(conv3x3(cat(avg_c, max_c))) gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = jnp.concatenate([avg, mx], axis=-1)
        a = Conv(1, 3, padding=1, kernel_init=c2_msra_fill(),
                 dtype=self.dtype, name="sam_conv")(a)
        return x * jax.nn.sigmoid(a.astype(jnp.float32)).astype(x.dtype)


class SAGMaskHead(nn.Module):
    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(R, P, P, C) -> (R, 2P, 2P, num_classes)."""
        for i in range(self.num_conv):
            x = Conv(self.conv_dim, 3, padding=1, kernel_init=c2_msra_fill(),
                     dtype=self.dtype, name=f"mask_fcn{i+1}")(x)
            x = jax.nn.relu(x)
        x = SpatialAttention(dtype=self.dtype, name="sam")(x)
        x = ConvTranspose(self.conv_dim, kernel_size=2, stride=2, padding=0,
                          kernel_init=c2_msra_fill(), dtype=self.dtype,
                          name="deconv")(x)
        x = jax.nn.relu(x)
        return Conv(self.num_classes, 1, padding=0,
                    kernel_init=nn.initializers.normal(0.001),
                    dtype=self.dtype, name="predictor")(x)


class CenterMask(nn.Module):
    """FCOS detector + SAG mask branch.

    ``fcos`` serves as the detection-config holder and supplies its pure
    target/inference math; the backbone is owned directly by this module
    (so the param tree is backbone/…, fcos_head/…, mask_head/…).
    """

    backbone: nn.Module
    fcos: FCOS
    num_classes: int = 80
    mask_in_features: Sequence[str] = ("p3", "p4", "p5")
    mask_strides: Sequence[int] = (8, 16, 32)
    mask_pooler_resolution: int = 14
    max_fg: int = 64  # fixed GT-box capacity for mask training
    pooler_impl: str = "pallas"  # TPU.POOLER_IMPL, same knob as ROI heads
    train: bool = False
    dtype: Dtype = jnp.float32

    def _pool(self, features, boxes):
        # Same pooler-impl dispatch as the R-CNN ROI heads (TPU.POOLER_IMPL):
        # default the fused Pallas window pool, with the gather/fast/windowed
        # forms selectable for A/B and debugging.
        feats = [features[f] for f in self.mask_in_features]
        from ..ops.roi_align import (
            multilevel_roi_align,
            multilevel_roi_align_fast,
            multilevel_roi_align_windowed,
            pallas_pooler_supported,
        )

        impl_name = self.pooler_impl
        if impl_name == "pallas" and not pallas_pooler_supported(
            feats[0].shape[-1]
        ):
            impl_name = "fast"  # BiFPN's 160-ch pyramid (see helper note)
        if impl_name == "pallas":
            return multilevel_roi_align_pallas(
                tuple(feats), boxes, tuple(self.mask_strides),
                self.mask_pooler_resolution, 2, True,
            )
        if impl_name == "fast":
            return jax.vmap(lambda *a: multilevel_roi_align_fast(
                tuple(a[:-1]), a[-1], tuple(self.mask_strides),
                self.mask_pooler_resolution, 2, True,
            ))(*feats, boxes)
        impl = (
            multilevel_roi_align_windowed
            if impl_name == "windowed"
            else multilevel_roi_align
        )
        return jax.vmap(lambda *a: impl(
            list(a[:-1]), a[-1], list(self.mask_strides),
            self.mask_pooler_resolution, 2, True,
        ))(*feats, boxes)

    @nn.compact
    def __call__(self, images, image_sizes, gt: Optional[GroundTruth] = None):
        # run FCOS with feature capture
        mean = jnp.asarray(self.fcos.pixel_mean, jnp.float32)
        std = jnp.asarray(self.fcos.pixel_std, jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        features = self.backbone(x.astype(self.dtype))
        feats = [features[f] for f in self.fcos.in_features]

        from .fcos import FCOSHead, compute_locations

        head = FCOSHead(
            num_classes=self.fcos.num_classes, num_convs=self.fcos.num_convs,
            in_channels=feats[0].shape[-1], norm=self.fcos.norm,
            prior_prob=self.fcos.prior_prob,
            centerness_on_reg=self.fcos.centerness_on_reg,
            use_scale=self.fcos.use_scale, train=self.train,
            dtype=self.dtype, name="fcos_head",
        )
        logits_l, regs_l, ctrs_l = head(feats)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        locations_l = compute_locations(shapes, self.fcos.fpn_strides)

        mask_head = SAGMaskHead(self.num_classes, dtype=self.dtype,
                                name="mask_head")

        if self.train:
            assert gt is not None and gt.masks is not None
            losses = self.fcos._losses(logits_l, regs_l, ctrs_l, locations_l, gt)

            # CenterMask2 protocol: the mask branch trains on the FCOS
            # head's own proposals — decoded boxes at positive locations
            # post-NMS (CenterMask2's proposal_generator output) — matched
            # to GT (Matcher 0.5, GT-appended like d2 ROIHeads) and
            # subsampled to the fixed fg capacity. Proposal coordinates
            # are stop-grad (standard two-stage semantics).
            from ..ops import Matcher
            from .roi_heads import sample_proposals_single

            props, _ = self.fcos._inference(
                [jax.lax.stop_gradient(l) for l in logits_l],
                [jax.lax.stop_gradient(r) for r in regs_l],
                [jax.lax.stop_gradient(c) for c in ctrs_l],
                locations_l, image_sizes,
            )
            b, m = gt.classes.shape
            k = self.max_fg
            key = (
                self.make_rng("sampling")
                if self.has_rng("sampling") else jax.random.PRNGKey(0)
            )
            keys = jax.random.split(key, b)
            sampled = jax.vmap(
                lambda kk, pb, pv, gb, gc, gv: sample_proposals_single(
                    kk, pb, pv, GroundTruth(gb, gc, gv), k,
                    positive_fraction=1.0,
                    matcher=Matcher([0.5], [0, 1]),
                    num_classes=self.num_classes, append_gt=True,
                )
            )(keys, props.boxes, props.valid, gt.boxes, gt.classes, gt.valid)
            fg_boxes = sampled.boxes
            fg_classes = sampled.gt_classes
            fg_idx = sampled.gt_idx
            fg_valid = sampled.valid & (sampled.gt_classes < self.num_classes)
            self.sow("intermediates", "mask_train_boxes", fg_boxes)
            self.sow("intermediates", "fcos_proposals", props.boxes)

            pooled = self._pool(features, fg_boxes)
            flat = pooled.reshape(b * k, *pooled.shape[2:])
            mask_logits = mask_head(flat)
            s = mask_logits.shape[1]
            targets = jax.vmap(
                lambda gm, gb, rb, gi: crop_and_resize_masks(gm, gb, rb, gi, s)
            )(gt.masks, gt.boxes, fg_boxes, fg_idx)
            losses["loss_mask"] = mask_loss(
                mask_logits, targets.reshape(b * k, s, s),
                fg_classes.reshape(-1), fg_valid.reshape(-1), self.num_classes,
            )
            return losses

        dets, _ = self.fcos._inference(logits_l, regs_l, ctrs_l, locations_l,
                                       image_sizes)
        b, d = dets.scores.shape
        pooled = self._pool(features, dets.boxes)
        flat = pooled.reshape(b * d, *pooled.shape[2:])
        mask_logits = mask_head(flat)
        s = mask_logits.shape[1]
        mask_logits = mask_logits.reshape(b, d, s, s, -1)
        cls_idx = jnp.clip(dets.classes, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            mask_logits, cls_idx[..., None, None, None], axis=-1
        )[..., 0]
        return dets, jax.nn.sigmoid(sel.astype(jnp.float32))


def build_centermask(cfg, train: bool = False, axis_name=None):
    from .build import build_backbone, _dtype_of

    fcos = build_fcos(cfg, train=train, axis_name=axis_name)
    backbone = build_backbone(cfg, train=train, axis_name=axis_name,
                              dtype=_dtype_of(cfg))
    return CenterMask(
        backbone=backbone,
        fcos=fcos,
        num_classes=cfg.MODEL.FCOS.NUM_CLASSES,
        mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        max_fg=min(cfg.TPU.MAX_GT_BOXES, 64),
        pooler_impl=cfg.TPU.POOLER_IMPL,
        train=train,
        dtype=fcos.dtype,
    )

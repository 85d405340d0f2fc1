"""CenterMask — anchor-free instance segmentation (FCOS + SAG-Mask).

The reference's CenterMask rows (README table "CenterMask R-50-BiFPN")
come from the external CenterMask2 codebase (ref README.md:156-163);
here it is a first-class citizen built from the published architecture:
FCOS detection + a spatial-attention-guided (SAG) mask head over ROIs
pooled from P3-P5.

SAG-Mask head: 4 convs → spatial attention module (channel avg+max pool
→ 3x3 conv → sigmoid gate) → 2x2 deconv → per-class 1x1 predictor.

Training note (documented deviation): CenterMask2 trains the mask branch
on FCOS's positive proposals; here it trains on randomly JITTERED GT
boxes (center +-10% wh, scale +-10%, targets re-cropped to the jittered
windows) — a proposal-like box distribution with fixed GT capacity
instead of dynamic FCOS-positive counts (TPU static shapes). Jitter
engages when a "sampling" rng stream is provided, as the trainers do.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.roi_align import multilevel_roi_align_fast
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
    train: bool = False
    dtype: Dtype = jnp.float32

    def _pool(self, features, boxes):
        feats = [features[f] for f in self.mask_in_features]
        return jax.vmap(lambda *a: multilevel_roi_align_fast(
            tuple(a[:-1]), a[-1], tuple(self.mask_strides),
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

            # mask branch on (up to max_fg) GT boxes
            b, m = gt.classes.shape
            k = min(self.max_fg, m)
            _, fg_idx = jax.lax.top_k(gt.valid.astype(jnp.int32), k)
            fg_valid = jnp.take_along_axis(gt.valid, fg_idx, axis=1)
            fg_boxes = jnp.take_along_axis(gt.boxes, fg_idx[..., None], axis=1)
            fg_classes = jnp.take_along_axis(gt.classes, fg_idx, axis=1)

            # Jitter the GT boxes (center +-10% wh, scale +-10%) so the mask
            # branch trains on a proposal-like distribution — approximating
            # CenterMask2's FCOS-positive boxes rather than exact GT crops.
            # Mask targets below are re-cropped to the jittered windows, so
            # supervision stays consistent (Mask R-CNN semantics).
            if self.has_rng("sampling"):
                key = self.make_rng("sampling")
                noise = jax.random.uniform(
                    key, fg_boxes.shape, minval=-0.1, maxval=0.1
                )
                wh = fg_boxes[..., 2:4] - fg_boxes[..., 0:2]
                ctr = (fg_boxes[..., 0:2] + fg_boxes[..., 2:4]) / 2
                ctr = ctr + noise[..., 0:2] * wh
                half = jnp.maximum(wh / 2 * (1.0 + noise[..., 2:4]), 1.0)
                jit_boxes = jnp.concatenate([ctr - half, ctr + half], axis=-1)
                hw = image_sizes.astype(jit_boxes.dtype)  # (B, 2) = (h, w)
                lim = jnp.stack(
                    [hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1
                )[:, None, :]
                fg_boxes = jnp.clip(jit_boxes, 0.0, lim)

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
        train=train,
        dtype=fcos.dtype,
    )

"""Mask R-CNN mask head + TPU-native mask target generation.

d2-v0.1.1 parity for ``MaskRCNNConvUpsampleHead`` (NUM_CONV 3x3 convs →
2x2/s2 deconv → 1x1 per-class predictor; msra init, normal(0.001)
predictor) and its BCE loss over foreground ROIs on the GT-class channel.

Mask targets, TPU redesign: the reference rasterizes GT polygons per
proposal at loss time on GPU (d2 mask_ops). Here the host pipeline
rasterizes each GT instance ONCE into a fixed (MH, MW) canvas covering
its GT box; inside the jitted step, targets are produced by bilinear
crop-resize of that canvas under the proposal→gtbox relative transform
(same approach as the TF TPU Mask R-CNN; fully static shapes).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.losses import bce_with_logits

from .layers import Conv, ConvTranspose, c2_msra_fill


Dtype = Any


class MaskRCNNConvUpsampleHead(nn.Module):
    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    norm: str = ""
    cls_agnostic: bool = False
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(R, P, P, C) -> (R, 2P, 2P, num_classes) mask logits."""
        for i in range(self.num_conv):
            x = Conv(self.conv_dim, 3, padding=1, norm=self.norm,
                     use_bias=(self.norm == ""), train=self.train,
                     axis_name=self.axis_name, kernel_init=c2_msra_fill(),
                     dtype=self.dtype, name=f"mask_fcn{i+1}")(x)
            x = jax.nn.relu(x)
        x = ConvTranspose(self.conv_dim, kernel_size=2, stride=2, padding=0,
                          kernel_init=c2_msra_fill(), dtype=self.dtype,
                          name="deconv")(x)
        x = jax.nn.relu(x)
        out_ch = 1 if self.cls_agnostic else self.num_classes
        x = Conv(out_ch, 1, padding=0,
                 kernel_init=nn.initializers.normal(0.001),
                 dtype=self.dtype, name="predictor")(x)
        return x


def crop_and_resize_masks(
    gt_masks: jnp.ndarray,  # (M, MH, MW) float canvases covering each gt box
    gt_boxes: jnp.ndarray,  # (M, 4) xyxy image coords (the canvas extents)
    rois: jnp.ndarray,  # (R, 4) proposal boxes in image coords
    roi_gt_idx: jnp.ndarray,  # (R,) matched gt index per roi
    out_size: int,
) -> jnp.ndarray:
    """(R, out_size, out_size) float mask targets in [0, 1]."""
    mh, mw = gt_masks.shape[1], gt_masks.shape[2]
    g = gt_boxes[roi_gt_idx]  # (R, 4)
    gw = jnp.maximum(g[:, 2] - g[:, 0], 1e-4)
    gh = jnp.maximum(g[:, 3] - g[:, 1], 1e-4)

    # proposal corners in canvas pixel coords (half-pixel centers)
    x1 = (rois[:, 0] - g[:, 0]) / gw * mw
    x2 = (rois[:, 2] - g[:, 0]) / gw * mw
    y1 = (rois[:, 1] - g[:, 1]) / gh * mh
    y2 = (rois[:, 3] - g[:, 1]) / gh * mh

    p = (jnp.arange(out_size, dtype=rois.dtype) + 0.5) / out_size
    ys = y1[:, None] + p[None, :] * (y2 - y1)[:, None] - 0.5  # (R, S)
    xs = x1[:, None] + p[None, :] * (x2 - x1)[:, None] - 0.5

    # Bilinear sampling as two interpolation-matrix contractions (the
    # same trick as the ROI pooler's adjoint): the hat weight
    # relu(1 - |coord - tap|) over the canvas axis reproduces the
    # two-tap bilinear kernel exactly, with out-of-canvas taps simply
    # absent (== the zero-padding semantics of the gather formulation).
    # This replaces ~4*R*S*S scalar gathers per image — TPU-hostile —
    # with small MXU einsums; measured 41 ms/step -> ~0 at batch 8
    # stage 3 (the crop was 11% of the whole train step).
    ay = jax.nn.relu(
        1.0 - jnp.abs(ys[:, :, None] - jnp.arange(mh, dtype=ys.dtype))
    )  # (R, S, MH)
    ax = jax.nn.relu(
        1.0 - jnp.abs(xs[:, :, None] - jnp.arange(mw, dtype=xs.dtype))
    )  # (R, S, MW)

    # Canvas selection as a one-hot matmul (a row gather lowers to a
    # slow dynamic-gather on TPU; (R, M) @ (M, MH*MW) is trivial).
    sel = jnp.einsum(
        "rm,mhw->rhw",
        jax.nn.one_hot(roi_gt_idx, gt_masks.shape[0], dtype=gt_masks.dtype),
        gt_masks, preferred_element_type=jnp.float32,
    )
    tmp = jnp.einsum("rhw,rqw->rhq", sel, ax,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("rph,rhq->rpq", ay, tmp,
                      preferred_element_type=jnp.float32)


def mask_loss(
    mask_logits: jnp.ndarray,  # (R, S, S, C) or (R, S, S, 1)
    mask_targets: jnp.ndarray,  # (R, S, S) in [0, 1]
    gt_classes: jnp.ndarray,  # (R,)
    fg_valid: jnp.ndarray,  # (R,) bool
    num_classes: int,
) -> jnp.ndarray:
    logits = mask_logits.astype(jnp.float32)
    if logits.shape[-1] == 1:
        sel = logits[..., 0]
    else:
        cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
        sel = jnp.take_along_axis(
            logits, cls_idx[:, None, None, None], axis=-1
        )[..., 0]
    t = (mask_targets >= 0.5).astype(jnp.float32)
    bce = bce_with_logits(sel, t)
    per_roi = jnp.mean(bce, axis=(1, 2))
    n = jnp.maximum(jnp.sum(fg_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(fg_valid, per_roi, 0.0)) / n

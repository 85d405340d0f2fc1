"""Keypoint R-CNN head — d2 v0.1.1 ``KRCNNConvDeconvUpsampleHead`` semantics.

The reference inherits this head from detectron2 (its evaluator exercises
OKS keypoints at ref afigan/evaluation/coco_evaluation.py:477-511, and
``MODEL.KEYPOINT_ON`` is a first-class d2 switch). Architecture (d2
keypoint_head.py): 8 x [3x3 conv 512 + ReLU] -> ConvTranspose2d(k=4, s=2,
p=1) to ``num_keypoints`` channels -> 2x bilinear upsample, giving a
(4 x pooler_resolution)^2 heatmap per keypoint (56x56 at resolution 14).

Loss (d2 ``keypoint_rcnn_loss``): each visible GT keypoint is mapped to
one cell of the heatmap grid over its ROI; softmax cross-entropy over the
flattened heatmap, summed over visible keypoints and normalized by their
count (NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS).

Inference (d2 ``heatmaps_to_keypoints``): d2 bicubically resizes each
heatmap to its ROI's pixel size (a dynamic shape per box) and argmaxes.
TPU redesign: bilinear-upsample the heatmap by a STATIC 2x (matching the
head's own output resolution scale), argmax on the fixed grid, and map
the cell center into box coordinates — sub-cell precision of 1/(2*56) of
the box extent with fully static shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv, ConvTranspose

Dtype = Any


class KRCNNConvDeconvUpsampleHead(nn.Module):
    """(R, P, P, C) pooled features -> (R, 4P, 4P, K) keypoint logits."""

    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, dim in enumerate(self.conv_dims):
            x = Conv(
                dim, 3, padding=1, dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"
                ),
                name=f"conv_fcn{i + 1}",
            )(x)
            x = jax.nn.relu(x)
        # d2: ConvTranspose2d(k=4, s=2, p=1) named "score_lowres"
        x = ConvTranspose(
            self.num_keypoints, kernel_size=4, stride=2, padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="score_lowres",
        )(x)
        # d2: interpolate(scale_factor=2, mode="bilinear", align_corners=False)
        r, h, w, k = x.shape
        x = jax.image.resize(
            x.astype(jnp.float32), (r, h * 2, w * 2, k), method="bilinear"
        )
        return x


def keypoints_to_heatmap(
    keypoints: jnp.ndarray,  # (R, K, 3) [x, y, vis] image coords
    rois: jnp.ndarray,  # (R, 4) xyxy
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map keypoints into per-ROI heatmap cell indices (d2
    structures/keypoints.py ``_keypoints_to_heatmap`` numerics).

    Returns (heatmap index (R, K) int32 in [0, S*S), valid (R, K) bool).
    """
    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    scale_y = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)

    x = (keypoints[..., 0] - offset_x) * scale_x
    y = (keypoints[..., 1] - offset_y) * scale_y
    x = jnp.floor(x)
    y = jnp.floor(y)
    # d2: points exactly on the right/bottom edge belong to the last cell
    x = jnp.where(x == heatmap_size, x - 1, x)
    y = jnp.where(y == heatmap_size, y - 1, y)
    inside = (x >= 0) & (x < heatmap_size) & (y >= 0) & (y < heatmap_size)
    valid = inside & (keypoints[..., 2] > 0)
    lin = (y * heatmap_size + x).astype(jnp.int32)
    return jnp.clip(lin, 0, heatmap_size * heatmap_size - 1), valid


def keypoint_rcnn_loss(
    logits: jnp.ndarray,  # (R, S, S, K)
    gt_keypoints: jnp.ndarray,  # (R, K, 3) image coords
    rois: jnp.ndarray,  # (R, 4)
    roi_valid: jnp.ndarray,  # (R,)
    normalize_by_visible: bool = True,
    loss_weight: float = 1.0,
    normalizer: float | None = None,
) -> jnp.ndarray:
    """Softmax CE over the flattened heatmap per visible keypoint
    (d2 roi_heads/keypoint_head.py ``keypoint_rcnn_loss``)."""
    r, s, _, k = logits.shape
    target, kp_valid = keypoints_to_heatmap(gt_keypoints, rois, s)
    kp_valid = kp_valid & roi_valid[:, None]

    flat = logits.astype(jnp.float32).reshape(r, s * s, k)
    flat = jnp.moveaxis(flat, -1, 1).reshape(r * k, s * s)  # (R*K, S*S)
    tgt = target.reshape(r * k)
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    vis = kp_valid.reshape(r * k)
    total = jnp.sum(jnp.where(vis, ce, 0.0))
    if normalize_by_visible:
        norm = jnp.maximum(jnp.sum(vis.astype(jnp.float32)), 1.0)
    else:
        # d2 semantics: a CONSTANT normalizer (num_images *
        # batch_size_per_image * positive_fraction), not the per-step
        # valid-ROI count — the flag-off mode must not inflate the loss
        # on sparse images.
        assert normalizer is not None, (
            "normalize_by_visible=False requires the d2 constant normalizer"
        )
        norm = jnp.maximum(jnp.asarray(normalizer, jnp.float32), 1.0)
    return loss_weight * total / norm


def heatmaps_to_keypoints(
    logits: jnp.ndarray,  # (R, S, S, K)
    rois: jnp.ndarray,  # (R, 4)
) -> jnp.ndarray:
    """Heatmap argmax -> (R, K, 3) [x, y, score] in image coordinates.

    Static-shape variant of d2 ``heatmaps_to_keypoints`` (see module
    docstring): 2x bilinear upsample, argmax, cell-center mapping; the
    score is the softmax probability of the argmax cell on the ORIGINAL
    grid (matching d2's per-keypoint probability semantics).
    """
    r, s, _, k = logits.shape
    maps = logits.astype(jnp.float32)
    up = jax.image.resize(maps, (r, s * 2, s * 2, k), method="bilinear")
    s2 = s * 2
    flat = up.reshape(r, s2 * s2, k)
    idx = jnp.argmax(flat, axis=1)  # (R, K)
    yy = (idx // s2).astype(jnp.float32)
    xx = (idx % s2).astype(jnp.float32)

    w = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    h = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)
    x = rois[:, 0:1] + (xx + 0.5) * w / s2
    y = rois[:, 1:2] + (yy + 0.5) * h / s2

    # probability of the selected location on the original grid
    probs = jax.nn.softmax(maps.reshape(r, s * s, k), axis=1)
    orig_idx = jnp.clip(
        (yy / 2).astype(jnp.int32) * s + (xx / 2).astype(jnp.int32),
        0, s * s - 1,
    )
    score = jnp.take_along_axis(probs, orig_idx[:, None, :], axis=1)[:, 0, :]
    return jnp.stack([x, y, score], axis=-1)

"""Anchor/proposal ↔ ground-truth matcher — vectorized XLA, padded-GT aware.

Matches detectron2 v0.1.1 ``Matcher`` semantics (used by the reference via
MODEL.RPN.IOU_THRESHOLDS / MODEL.ROI_HEADS.IOU_THRESHOLDS):
  * per-anchor argmax over GT rows, bucketed into labels by thresholds
  * optional low-quality promotion: for each GT, anchors tying its best IoU
    are forced positive.

TPU deviation (favorable): GT rows are padded to a fixed count with a
validity mask; invalid rows never win the argmax and never promote
low-quality matches. d2's degenerate promote-everything behavior for
zero-overlap GT is also guarded (requires best IoU > 0).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds == sorted(thresholds)
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) + 1
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
            match_quality_matrix: (M_gt, N) IoU matrix (padded GT rows included).
            gt_valid: (M_gt,) bool validity of each GT row.

        Returns:
            matches: (N,) int32 index of the best GT per anchor.
            match_labels: (N,) int8 in {-1, 0, 1}.
        """
        # Invalid GT rows must never win: set their quality to -1.
        quality = jnp.where(gt_valid[:, None], match_quality_matrix, -1.0)
        matched_vals = jnp.max(quality, axis=0)
        matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

        match_labels = jnp.full(matched_vals.shape, 1, dtype=jnp.int8)
        for label, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_bucket = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_bucket, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # best IoU per GT (invalid rows give -1 → can't promote)
            highest_per_gt = jnp.max(quality, axis=1)  # (M,)
            promote = (quality == highest_per_gt[:, None]) & (highest_per_gt[:, None] > 0)
            promote_any = jnp.any(promote, axis=0)  # (N,)
            match_labels = jnp.where(promote_any, jnp.int8(1), match_labels)

        return matches, match_labels

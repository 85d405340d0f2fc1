"""Anchor generation — static-shape, host-side precompute + XLA broadcast.

Matches detectron2 v0.1.1 ``DefaultAnchorGenerator`` numerics (which the
reference relies on via MODEL.ANCHOR_GENERATOR, e.g.
configs/Base-RCNN-FPN.yaml:9-11): cell anchors centered at the origin
(x0 = -w/2), grid offsets at ``(x + offset) * stride``, anchors enumerated
in (sizes x aspect_ratios) order per location, grid traversed row-major.

Because feature shapes are static on TPU, the full per-level anchor arrays
are computed once with numpy at trace time and become XLA constants.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp


def generate_cell_anchors(
    sizes: Sequence[float], aspect_ratios: Sequence[float]
) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) anchors centered at (0, 0)."""
    anchors = []
    for size in sizes:
        area = size**2.0
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


def grid_anchors(
    cell_anchors: np.ndarray, grid_h: int, grid_w: int, stride: int, offset: float = 0.0
) -> np.ndarray:
    """(grid_h * grid_w * A, 4) anchors over a feature grid, row-major."""
    shifts_x = (np.arange(grid_w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(grid_h, dtype=np.float32) + offset) * stride
    shift_x, shift_y = np.meshgrid(shifts_x, shifts_y)
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], axis=1
    )
    # (HW, 1, 4) + (1, A, 4) -> (HW, A, 4)
    out = shifts[:, None, :] + cell_anchors[None, :, :]
    return out.reshape(-1, 4)


class AnchorGenerator:
    """Per-FPN-level anchor generator with d2-compatible layout.

    Args:
        sizes: one list per level (or a single list broadcast to all levels).
        aspect_ratios: same broadcast convention.
        strides: per-level feature strides.
    """

    def __init__(
        self,
        sizes: Sequence[Sequence[float]],
        aspect_ratios: Sequence[Sequence[float]],
        strides: Sequence[int],
        offset: float = 0.0,
    ):
        num_levels = len(strides)
        if len(sizes) == 1:
            sizes = list(sizes) * num_levels
        if len(aspect_ratios) == 1:
            aspect_ratios = list(aspect_ratios) * num_levels
        assert len(sizes) == num_levels and len(aspect_ratios) == num_levels
        self.strides = list(strides)
        self.offset = offset
        self.cell_anchors = [
            generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]

    @property
    def num_anchors_per_location(self) -> List[int]:
        return [c.shape[0] for c in self.cell_anchors]

    def __call__(self, feature_shapes: Sequence[tuple]) -> List[jnp.ndarray]:
        """feature_shapes: [(H_l, W_l)] per level -> [(H_l*W_l*A, 4)] anchors."""
        out = []
        for (h, w), cell, stride in zip(feature_shapes, self.cell_anchors, self.strides):
            out.append(jnp.asarray(grid_anchors(cell, int(h), int(w), stride, self.offset)))
        return out


def build_anchor_generator(cfg, strides: Sequence[int]) -> AnchorGenerator:
    return AnchorGenerator(
        sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        aspect_ratios=cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        strides=strides,
        offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
    )

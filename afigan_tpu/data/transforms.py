"""Deterministic paired-scale image transforms (host side, numpy/cv2).

TPU redesign of the reference's transform generators + dual-scale replay
(ref: afigan/engine/transform_gen.py:472-560 apply_transform_gens_overlap2
and dataset_mapper.py:104-123): instead of cloning fvcore TransformList
objects and halving their fields, each transform here is a small record of
*resolved* parameters (target size, flip flag) that can be applied at any
scale ratio — the full-res and half-res pipelines share one record, which
is what keeps stage-1/2 feature pairs spatially consistent.

Covers the reference's training augmentations: ResizeShortestEdge
(choice/range sampling of MIN_SIZE_TRAIN, MAX_SIZE cap) + RandomFlip,
and eval resize (min/max size test).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ResolvedTransform:
    """One sampled augmentation, replayable at any scale ratio."""

    orig_h: int
    orig_w: int
    new_h: int
    new_w: int
    hflip: bool

    def at_scale(self, ratio: float) -> "ResolvedTransform":
        return ResolvedTransform(
            self.orig_h, self.orig_w,
            int(self.new_h * ratio), int(self.new_w * ratio), self.hflip,
        )

    # ---- appliers -------------------------------------------------------
    def apply_image(self, img: np.ndarray, interp: str = "linear") -> np.ndarray:
        import cv2

        flags = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
        out = cv2.resize(img, (self.new_w, self.new_h), interpolation=flags)
        if out.ndim == 2:
            out = out[:, :, None]
        if self.hflip:
            out = out[:, ::-1]
        return np.ascontiguousarray(out)

    def apply_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """(N, 4) xyxy in original coords -> transformed coords."""
        if boxes.size == 0:
            return boxes.reshape(-1, 4)
        sx = self.new_w / self.orig_w
        sy = self.new_h / self.orig_h
        out = boxes.astype(np.float32).copy()
        out[:, [0, 2]] *= sx
        out[:, [1, 3]] *= sy
        if self.hflip:
            x1 = self.new_w - out[:, 2]
            x2 = self.new_w - out[:, 0]
            out[:, 0], out[:, 2] = x1, x2
        return out

    def apply_polygons(self, polygons):
        sx = self.new_w / self.orig_w
        sy = self.new_h / self.orig_h
        out = []
        for p in polygons:
            p = np.asarray(p, dtype=np.float64).reshape(-1, 2).copy()
            p[:, 0] *= sx
            p[:, 1] *= sy
            if self.hflip:
                p[:, 0] = self.new_w - p[:, 0]
            out.append(p.reshape(-1).tolist())
        return out


def _shortest_edge_size(h: int, w: int, short: int, max_size: int) -> Tuple[int, int]:
    """d2 ResizeShortestEdge.get_output_shape numerics."""
    scale = short / min(h, w)
    if h < w:
        nh, nw = short, scale * w
    else:
        nh, nw = scale * h, short
    if max(nh, nw) > max_size:
        s = max_size / max(nh, nw)
        nh, nw = nh * s, nw * s
    return int(nh + 0.5), int(nw + 0.5)


def sample_train_transform(
    rng: np.random.RandomState,
    h: int,
    w: int,
    min_sizes: Sequence[int],
    max_size: int,
    sampling: str = "choice",
    flip_prob: float = 0.5,
) -> ResolvedTransform:
    if sampling == "choice":
        short = int(rng.choice(list(min_sizes)))
    else:  # "range"
        short = int(rng.randint(min(min_sizes), max(min_sizes) + 1))
    nh, nw = _shortest_edge_size(h, w, short, max_size)
    return ResolvedTransform(h, w, nh, nw, bool(rng.rand() < flip_prob))


def test_transform(h: int, w: int, min_size: int, max_size: int) -> ResolvedTransform:
    nh, nw = _shortest_edge_size(h, w, min_size, max_size)
    return ResolvedTransform(h, w, nh, nw, False)

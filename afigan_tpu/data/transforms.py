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
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    """Horizontally flip (N, 4) xyxy boxes in a width-wide image — the
    single definition of the flip convention (d2 HFlipTransform:
    x -> w - x, so x1' = w - x2, x2' = w - x1). Used by the training
    transform AND both TTA flip/unflip paths so they cannot diverge."""
    out = np.asarray(boxes, np.float32).copy()
    x1 = width - out[:, 2]
    x2 = width - out[:, 0]
    out[:, 0], out[:, 2] = x1, x2
    return out


@dataclasses.dataclass
class ResolvedTransform:
    """One sampled augmentation, replayable at any scale ratio.

    Pipeline order (d2 DatasetMapper with INPUT.CROP): crop (ORIGINAL
    coords) → resize to (new_h, new_w) → hflip → color jitter. The x0.5
    replay (``at_scale``) halves only the resize target: crop/flip/color
    are identical, which keeps the stage-1/2 feature pairs consistent.
    """

    orig_h: int
    orig_w: int
    new_h: int
    new_w: int
    hflip: bool
    # crop window in ORIGINAL image coords (y0, x0, h, w); None = no crop
    crop: Optional[Tuple[int, int, int, int]] = None
    # d2 color jitter blend weights (1.0 = identity)
    brightness: float = 1.0
    contrast: float = 1.0
    saturation: float = 1.0
    # channel order of the decoded image (INPUT.FORMAT): the saturation
    # grayscale weights depend on it
    fmt: str = "BGR"

    @property
    def src_h(self) -> int:
        return self.crop[2] if self.crop else self.orig_h

    @property
    def src_w(self) -> int:
        return self.crop[3] if self.crop else self.orig_w

    def at_scale(self, ratio: float) -> "ResolvedTransform":
        return dataclasses.replace(
            self, new_h=int(self.new_h * ratio), new_w=int(self.new_w * ratio)
        )

    # ---- appliers -------------------------------------------------------
    def apply_image(self, img: np.ndarray, interp: str = "linear",
                    color: bool = True) -> np.ndarray:
        import cv2

        if self.crop:
            y0, x0, ch, cw = self.crop
            img = img[y0 : y0 + ch, x0 : x0 + cw]
        flags = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
        out = cv2.resize(img, (self.new_w, self.new_h), interpolation=flags)
        if out.ndim == 2:
            out = out[:, :, None]
        if self.hflip:
            out = out[:, ::-1]
        if color and out.shape[-1] == 3 and (
            self.brightness != 1.0 or self.contrast != 1.0 or self.saturation != 1.0
        ):
            out = self._apply_color(out.astype(np.float32))
        return np.ascontiguousarray(out)

    def _apply_color(self, img: np.ndarray) -> np.ndarray:
        """d2 BlendTransform numerics: out = w*img + (1-w)*target, then
        clip to the uint8 range (BlendTransform clips for uint8 inputs —
        brightness/contrast > 1 must not push pixels past 255)."""
        if self.brightness != 1.0:
            img = self.brightness * img  # target = 0
        if self.contrast != 1.0:
            img = self.contrast * img + (1 - self.contrast) * img.mean()
        if self.saturation != 1.0:
            # d2 RandomSaturation grayscale weights are per-channel-order:
            # BGR [0.114, 0.587, 0.299]; reversed for INPUT.FORMAT=RGB
            wts = np.array([0.114, 0.587, 0.299], np.float32)
            if self.fmt == "RGB":
                wts = wts[::-1]
            gray = (img * wts).sum(-1, keepdims=True)
            img = self.saturation * img + (1 - self.saturation) * gray
        return np.clip(img, 0.0, 255.0)

    def apply_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """(N, 4) xyxy in original coords -> transformed coords."""
        if boxes.size == 0:
            return boxes.reshape(-1, 4)
        out = boxes.astype(np.float32).copy()
        if self.crop:
            y0, x0 = self.crop[0], self.crop[1]
            out[:, [0, 2]] -= x0
            out[:, [1, 3]] -= y0
        sx = self.new_w / self.src_w
        sy = self.new_h / self.src_h
        out[:, [0, 2]] *= sx
        out[:, [1, 3]] *= sy
        if self.hflip:
            out = hflip_boxes(out, self.new_w)
        return out

    def apply_keypoints(self, keypoints: np.ndarray,
                        hflip_indices=None) -> np.ndarray:
        """(N, K, 3) COCO keypoints [x, y, vis] in original coords ->
        transformed coords (ref afigan_utils.py:140-231, d2
        ``transform_keypoint_annotations``): coords follow the same
        crop/resize/flip chain as boxes; on hflip the left/right
        keypoint IDENTITIES are swapped via ``hflip_indices`` (the
        dataset's keypoint_hflip_indices permutation — without it a
        flipped "left eye" would keep the left-eye slot); keypoints
        landing outside the transformed image get visibility 0, and
        invisible keypoints are zeroed entirely (d2 convention)."""
        kp = np.asarray(keypoints, np.float32).reshape(len(keypoints), -1, 3).copy()
        if kp.size == 0:
            return kp
        if self.crop:
            kp[..., 0] -= self.crop[1]
            kp[..., 1] -= self.crop[0]
        kp[..., 0] *= self.new_w / self.src_w
        kp[..., 1] *= self.new_h / self.src_h
        if self.hflip:
            kp[..., 0] = self.new_w - kp[..., 0]
            if hflip_indices is None:
                # d2 transform_keypoint_annotations raises here: flipping
                # without the left/right permutation silently trains
                # left keypoints on right-side pixels
                raise ValueError(
                    "Cannot flip keypoints without keypoint_hflip_indices "
                    "(the dataset's categories must list keypoint names)"
                )
            kp = kp[:, np.asarray(hflip_indices, np.int64)]
        inside = (
            (kp[..., 0] >= 0) & (kp[..., 0] <= self.new_w)
            & (kp[..., 1] >= 0) & (kp[..., 1] <= self.new_h)
        )
        kp[..., 2] = np.where(inside, kp[..., 2], 0.0)
        kp[kp[..., 2] == 0] = 0.0
        return kp

    def apply_polygons(self, polygons):
        sx = self.new_w / self.src_w
        sy = self.new_h / self.src_h
        out = []
        for p in polygons:
            p = np.asarray(p, dtype=np.float64).reshape(-1, 2).copy()
            if self.crop:
                p[:, 0] -= self.crop[1]
                p[:, 1] -= self.crop[0]
            p[:, 0] *= sx
            p[:, 1] *= sy
            if self.hflip:
                p[:, 0] = self.new_w - p[:, 0]
            out.append(p.reshape(-1).tolist())
        return out


def _shortest_edge_size(h: int, w: int, short: int, max_size: int) -> Tuple[int, int]:
    """d2 ResizeShortestEdge.get_output_shape numerics; size 0 means
    no resize (the d2 convention for disabling test-time resize)."""
    if short == 0:
        return h, w
    scale = short / min(h, w)
    if h < w:
        nh, nw = short, scale * w
    else:
        nh, nw = scale * h, short
    if max(nh, nw) > max_size:
        s = max_size / max(nh, nw)
        nh, nw = nh * s, nw * s
    return int(nh + 0.5), int(nw + 0.5)


def get_crop_size(rng: np.random.RandomState, crop_type: str,
                  crop_size: Sequence[float], h: int, w: int) -> Tuple[int, int]:
    """d2 RandomCrop.get_crop_size (ref transform_gen.py:220-310)."""
    if crop_type == "relative":
        ch, cw = crop_size
        return int(h * ch + 0.5), int(w * cw + 0.5)
    if crop_type == "relative_range":
        cs = np.asarray(crop_size, dtype=np.float32)
        ch, cw = cs + rng.rand(2) * (1 - cs)
        return int(h * ch + 0.5), int(w * cw + 0.5)
    if crop_type == "absolute":
        return int(crop_size[0]), int(crop_size[1])
    raise NotImplementedError(f"Unknown crop type {crop_type}")


def sample_crop(rng: np.random.RandomState, crop_type: str,
                crop_size: Sequence[float], h: int, w: int,
                instance_box=None) -> Tuple[int, int, int, int]:
    """Sample a crop window (y0, x0, ch, cw); when ``instance_box`` (xyxy)
    is given the window is guaranteed to contain the instance's center
    (ref afigan_utils.py:379-406 gen_crop_transform_with_instance)."""
    ch, cw = get_crop_size(rng, crop_type, crop_size, h, w)
    ch, cw = min(ch, h), min(cw, w)
    if instance_box is None:
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        return y0, x0, ch, cw
    cy = (instance_box[1] + instance_box[3]) * 0.5
    cx = (instance_box[0] + instance_box[2]) * 0.5
    # clamp off-image centers (corrupt annotations exist in COCO jsons)
    # so the randint ranges below stay non-empty
    cy = min(max(cy, 0.0), float(h))
    cx = min(max(cx, 0.0), float(w))
    min_y = max(int(np.floor(cy)) - ch, 0)
    min_x = max(int(np.floor(cx)) - cw, 0)
    max_y = min(max(h - ch, 0), int(np.ceil(cy)))
    max_x = min(max(w - cw, 0), int(np.ceil(cx)))
    y0 = rng.randint(min_y, max_y + 1)
    x0 = rng.randint(min_x, max_x + 1)
    return y0, x0, ch, cw


def sample_train_transform(
    rng: np.random.RandomState,
    h: int,
    w: int,
    min_sizes: Sequence[int],
    max_size: int,
    sampling: str = "choice",
    flip_prob: float = 0.5,
    crop: Optional[Tuple[int, int, int, int]] = None,
    color_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    fmt: str = "BGR",
) -> ResolvedTransform:
    if sampling == "choice":
        short = int(rng.choice(list(min_sizes)))
    else:  # "range"
        short = int(rng.randint(min(min_sizes), max(min_sizes) + 1))
    src_h, src_w = (crop[2], crop[3]) if crop else (h, w)
    nh, nw = _shortest_edge_size(src_h, src_w, short, max_size)
    kw = {}
    for name in ("brightness", "contrast", "saturation"):
        if color_ranges and name in color_ranges:
            lo, hi = color_ranges[name]
            kw[name] = float(rng.uniform(lo, hi))
    return ResolvedTransform(
        h, w, nh, nw, bool(rng.rand() < flip_prob), crop=crop, fmt=fmt, **kw
    )


def test_transform(h: int, w: int, min_size: int, max_size: int) -> ResolvedTransform:
    nh, nw = _shortest_edge_size(h, w, min_size, max_size)
    return ResolvedTransform(h, w, nh, nw, False)

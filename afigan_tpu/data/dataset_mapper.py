"""Dataset mapper: record dict → padded training arrays (host side).

TPU redesign of the reference's dual-scale DatasetMapper
(ref: afigan/engine/dataset_mapper.py:104-182): ONE sampled transform
(resize + flip) is replayed at full and x0.5 scale (the load-bearing
trick that keeps stage-1/2 feature pairs spatially consistent), and all
GT is padded to static shapes:
  * boxes (MAX_GT, 4) xyxy in transformed-image coords + validity mask
  * per-instance masks rasterized ONCE into a (MC, MC) canvas covering
    the instance's transformed box (crop-resized to 28x28 in-step).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .transforms import ResolvedTransform, sample_train_transform, test_transform
from .coco import read_image
from ..evaluation.rle import decode_rle, polygons_to_mask


def _rasterize_to_canvas(segm, box, canvas: int, tf: ResolvedTransform) -> np.ndarray:
    """Rasterize one instance's segmentation into a (canvas, canvas) patch
    covering its transformed box."""
    import cv2

    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    if segm is None:
        return np.zeros((canvas, canvas), np.float32)
    if isinstance(segm, dict):  # RLE in ORIGINAL image coords
        m = decode_rle(segm).astype(np.float32)
        m = tf.apply_image(m, interp="nearest")[:, :, 0]
        # sample the EXACT float box (cv2.resize pixel-center semantics:
        # dst center (x+0.5) -> src x1 + (x+0.5)*w/canvas - 0.5) — an
        # integer floor/ceil crop would misalign the canvas by up to a
        # pixel per edge vs the polygon path, which maps the float box.
        sx, sy = w / canvas, h / canvas
        M = np.array(
            [[sx, 0.0, x1 + 0.5 * sx - 0.5],
             [0.0, sy, y1 + 0.5 * sy - 0.5]], np.float32
        )
        return cv2.warpAffine(
            m, M, (canvas, canvas),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
        )
    # polygons: transform then shift/scale into canvas coords directly
    polys = tf.apply_polygons(segm)
    shifted = []
    for p in polys:
        p = np.asarray(p, np.float64).reshape(-1, 2)
        p[:, 0] = (p[:, 0] - x1) / w * canvas
        p[:, 1] = (p[:, 1] - y1) / h * canvas
        shifted.append(p.reshape(-1).tolist())
    return polygons_to_mask(shifted, canvas, canvas).astype(np.float32)


class DatasetMapper:
    """record → dict of numpy arrays (unpadded image; padded GT)."""

    def __init__(self, cfg, is_train: bool = True, dual_scale: bool = False,
                 seed: int = 0, keypoint_hflip_indices=None):
        self.is_train = is_train
        self.dual_scale = dual_scale
        self.keypoint_on = cfg.MODEL.KEYPOINT_ON
        self.num_keypoints = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS
        self.keypoint_hflip_indices = keypoint_hflip_indices
        self.fmt = cfg.INPUT.FORMAT
        self.min_sizes = (
            list(cfg.INPUT.MIN_SIZE_TRAIN) if is_train else [cfg.INPUT.MIN_SIZE_TEST]
        )
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST
        self.sampling = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
        self.max_gt = cfg.TPU.MAX_GT_BOXES
        self.mask_canvas = cfg.TPU.MASK_CANVAS
        self.mask_on = cfg.MODEL.MASK_ON
        # INPUT.CROP (d2 RandomCrop, instance-aware: the sampled window
        # must contain a random instance's center, ref afigan_utils.py:379)
        self.crop_enabled = bool(is_train and cfg.INPUT.CROP.ENABLED)
        self.crop_type = cfg.INPUT.CROP.TYPE
        self.crop_size = tuple(cfg.INPUT.CROP.SIZE)
        cj = cfg.INPUT.COLOR_JITTER
        self.color_ranges = None
        if is_train and cj.ENABLED:
            self.color_ranges = {
                "brightness": tuple(cj.BRIGHTNESS),
                "contrast": tuple(cj.CONTRAST),
                "saturation": tuple(cj.SATURATION),
            }
        self.rng = np.random.RandomState(seed)

    def __call__(self, record: Dict) -> Dict:
        img = record.get("image")
        if img is None:
            img = read_image(record["file_name"], self.fmt)
        h, w = img.shape[:2]

        if self.is_train:
            crop = None
            if self.crop_enabled:
                from .transforms import sample_crop

                anns = [
                    o for o in record.get("annotations", [])
                    if not o.get("iscrowd", 0)
                ]
                inst = None
                if anns:
                    pick = anns[self.rng.randint(len(anns))]
                    inst = pick["bbox"]  # xyxy (CocoDataset converts)
                crop = sample_crop(
                    self.rng, self.crop_type, self.crop_size, h, w,
                    instance_box=inst,
                )
            tf = sample_train_transform(
                self.rng, h, w, self.min_sizes, self.max_size, self.sampling,
                crop=crop, color_ranges=self.color_ranges, fmt=self.fmt,
            )
        else:
            tf = test_transform(h, w, self.min_sizes[0], self.max_size)

        # keep uint8 end-to-end: the models cast to float32 in-step
        # (meta_arch preprocess), so shipping uint8 is numerically exact
        # while quartering host pad/stack memcpy and host->device bytes.
        # Color jitter emits float32 for the jittered sample only; force
        # the whole run to float32 then so one batch never mixes dtypes.
        mapped = tf.apply_image(img)
        if self.color_ranges is not None:
            mapped = mapped.astype(np.float32, copy=False)
        out = {
            "image": mapped,
            "image_id": record.get("image_id", 0),
            "orig_height": h,
            "orig_width": w,
            "transform": tf,
        }

        sel = None
        if self.is_train:
            out["gt"], sel = self._make_gt(record, tf)
        if self.dual_scale:
            tf_half = tf.at_scale(0.5)
            half = tf_half.apply_image(img)
            if self.color_ranges is not None:
                half = half.astype(np.float32, copy=False)
            out["image_x0.5"] = half
            if self.is_train:
                # reuse the full-res instance selection so gt and gt_x0.5
                # slots stay aligned (the shared mask canvases require it)
                out["gt_x0.5"], _ = self._make_gt(
                    record, tf_half, share_masks=out.get("gt"), sel=sel
                )
        return out

    def _make_gt(self, record: Dict, tf: ResolvedTransform,
                 share_masks: Optional[Dict] = None, sel=None):
        objs = [o for o in record.get("annotations", []) if not o.get("iscrowd", 0)]
        boxes = np.zeros((self.max_gt, 4), np.float32)
        classes = np.zeros((self.max_gt,), np.int32)
        valid = np.zeros((self.max_gt,), bool)
        n = 0
        if objs:
            raw = np.asarray([o["bbox"] for o in objs], np.float32)
            tb = tf.apply_boxes(raw)
            tb[:, 0::2] = np.clip(tb[:, 0::2], 0, tf.new_w)
            tb[:, 1::2] = np.clip(tb[:, 1::2], 0, tf.new_h)
            keep = (tb[:, 2] > tb[:, 0] + 1e-3) & (tb[:, 3] > tb[:, 1] + 1e-3)
            if sel is None:
                # d2 filters crop/transform-invalidated instances BEFORE
                # the capacity cap — cropped-out objects must not occupy
                # MAX_GT slots while in-crop ones are dropped
                sel = np.flatnonzero(keep)[: self.max_gt]
            objs = [objs[i] for i in sel]
            tb = tb[sel]
            n = len(objs)
            boxes[:n] = tb
            classes[:n] = [o["category_id"] for o in objs]
            # keep flags at THIS scale (the shared sel comes from the
            # full-res pass; a halved borderline box can still degenerate)
            valid[:n] = keep[sel]
        gt = {"boxes": boxes, "classes": classes, "valid": valid}
        if self.keypoint_on:
            kp = np.zeros((self.max_gt, self.num_keypoints, 3), np.float32)
            raw_kp = [o.get("keypoints") for o in objs]
            if any(r is not None for r in raw_kp):
                stacked = np.zeros((n, self.num_keypoints, 3), np.float32)
                for i, r in enumerate(raw_kp):
                    if r is not None:
                        stacked[i] = np.asarray(r, np.float32).reshape(
                            self.num_keypoints, 3
                        )
                kp[:n] = tf.apply_keypoints(
                    stacked, hflip_indices=self.keypoint_hflip_indices
                )
            gt["keypoints"] = kp
        if self.mask_on:
            if share_masks is not None:
                # canvases are box-relative → scale-invariant; reuse
                gt["masks"] = share_masks["masks"]
            else:
                masks = np.zeros((self.max_gt, self.mask_canvas, self.mask_canvas),
                                 np.float32)
                for i, o in enumerate(objs):
                    if valid[i] and o.get("segmentation") is not None:
                        masks[i] = _rasterize_to_canvas(
                            o["segmentation"], boxes[i], self.mask_canvas, tf
                        )
                gt["masks"] = masks
        return gt, sel

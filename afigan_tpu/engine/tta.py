"""Test-time augmentation — multi-scale + flip inference (SURVEY §2.2 TTA).

The reference's GeneralizedRCNNWithTTA (ref run_net.py:51-66, gated on
TEST.AUG.*): run the detector at TEST.AUG.MIN_SIZES (+ horizontal flip),
map all detections back to original image coordinates, merge with
class-aware NMS, keep TEST.DETECTIONS_PER_IMAGE. Box-level TTA (the "†"
rows of the README table are box AP with multi-scale testing).

TPU note: every (scale, flip) pair is its own static shape → its own
compiled executable; shapes repeat across the dataset so each compiles
once. Mask probabilities are averaged over every (scale, flip) forward on
the merged boxes (d2 GeneralizedRCNNWithTTA semantics — see
``averaged_tta_masks`` below).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..data.transforms import test_transform
from ..evaluation.coco_eval import CocoEvaluator
from ..ops.image_list import (choose_bucket, pad_to_canvas,
                              required_size_divisibility)
from ..ops import batched_nms_padded
from .inference import rescale_boxes


def _forward_one(apply_fn, variables, img: np.ndarray, cfg):
    h, w = img.shape[:2]
    canvas = choose_bucket(h, w, cfg.TPU.IMAGE_BUCKETS,
                           required_size_divisibility(cfg))
    padded = pad_to_canvas(img.astype(np.float32), canvas)
    dets, masks = apply_fn(
        variables,
        jnp.asarray(padded[None]),
        jnp.asarray([[h, w]], jnp.int32),
    )
    return (
        np.asarray(dets.boxes)[0],
        np.asarray(dets.scores)[0],
        np.asarray(dets.classes)[0],
        np.asarray(dets.valid)[0],
    )


def averaged_tta_masks(cfg, mask_fn, variables, img, merged_boxes,
                       merged_scores, merged_classes, merged_valid):
    """d2 GeneralizedRCNNWithTTA mask fusion: run the mask branch on the
    MERGED boxes under EVERY (scale, flip) augmentation and average the
    mask PROBABILITIES (ref run_net.py:51-66 — the README's dagger mask
    rows measure exactly this). Returns ((D, S, S) averaged probs, n_aug).
    """
    from ..models.box_head import Detections

    oh, ow = img.shape[:2]
    prob_sum = None
    n_aug = 0
    for min_size in cfg.TEST.AUG.MIN_SIZES:
        tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
        resized = tf.apply_image(img)
        rh, rw = resized.shape[:2]
        variants = [(resized, False)]
        if cfg.TEST.AUG.FLIP:
            variants.append((np.ascontiguousarray(resized[:, ::-1]), True))
        for image_v, flipped in variants:
            canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS,
                                   required_size_divisibility(cfg))
            padded = pad_to_canvas(image_v.astype(np.float32), canvas)
            sb = merged_boxes.copy()
            sb[:, 0::2] *= rw / ow
            sb[:, 1::2] *= rh / oh
            if flipped:
                x1 = rw - sb[:, 2]
                x2 = rw - sb[:, 0]
                sb = np.stack([x1, sb[:, 1], x2, sb[:, 3]], axis=1)
            dets = Detections(
                boxes=jnp.asarray(sb),
                scores=jnp.asarray(merged_scores),
                classes=jnp.asarray(merged_classes),
                valid=jnp.asarray(merged_valid),
            )
            dets_b = jax.tree.map(lambda a: a[None], dets)
            _, masks = mask_fn(
                variables, jnp.asarray(padded[None]),
                jnp.asarray([[rh, rw]], jnp.int32), dets_b,
            )
            m = np.asarray(masks)[0]  # (D, S, S) probabilities
            if flipped:
                # a flipped-image mask is the mirror of the original crop
                m = m[:, :, ::-1]
            prob_sum = m if prob_sum is None else prob_sum + m
            n_aug += 1
    return prob_sum / max(n_aug, 1), n_aug


def run_tta_inference(cfg, model, variables, dataset,
                      max_images=None) -> Dict[str, Dict[str, float]]:
    from ..data.coco import read_image
    from .inference import paste_masks

    # d2 GeneralizedRCNNWithTTA: "TTA for keypoint is not supported yet"
    assert not cfg.MODEL.KEYPOINT_ON, "TTA for keypoints is not supported"
    tasks = ("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",)
    evaluator = CocoEvaluator(dataset, tasks=tasks)
    apply_fn = jax.jit(lambda v, images, sizes: model.apply(v, images, sizes))
    mask_fn = jax.jit(
        lambda v, images, sizes, dets: model.apply(
            v, images, sizes, given_dets=dets
        )
    )

    merge_nms = jax.jit(
        lambda b, s, c, v: batched_nms_padded(
            b, s, c, cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            cfg.TEST.DETECTIONS_PER_IMAGE, valid=v,
        )
    )

    for n, rec in enumerate(dataset.records):
        if max_images is not None and n >= max_images:
            break
        img = read_image(rec["file_name"], cfg.INPUT.FORMAT)
        oh, ow = img.shape[:2]

        all_boxes, all_scores, all_classes, all_valid = [], [], [], []
        for min_size in cfg.TEST.AUG.MIN_SIZES:
            tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
            resized = tf.apply_image(img)
            variants = [(resized, False)]
            if cfg.TEST.AUG.FLIP:
                variants.append((np.ascontiguousarray(resized[:, ::-1]), True))
            for image_v, flipped in variants:
                b, s, c, v = _forward_one(apply_fn, variables, image_v, cfg)
                b = rescale_boxes(b, image_v.shape[:2], (oh, ow))
                if flipped:
                    x1 = ow - b[:, 2]
                    x2 = ow - b[:, 0]
                    b = np.stack([x1, b[:, 1], x2, b[:, 3]], axis=1)
                all_boxes.append(b)
                all_scores.append(s)
                all_classes.append(c)
                all_valid.append(v)

        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        classes = np.concatenate(all_classes)
        valid = np.concatenate(all_valid)
        mb, ms, mi, mv = merge_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(classes), jnp.asarray(valid),
        )
        merged_boxes = np.asarray(mb)
        merged_scores = np.asarray(ms)
        merged_classes = np.asarray(classes)[np.asarray(mi)]
        merged_valid = np.asarray(mv)

        full_masks = None
        if cfg.MODEL.MASK_ON:
            avg, _ = averaged_tta_masks(
                cfg, mask_fn, variables, img,
                merged_boxes, merged_scores, merged_classes, merged_valid,
            )
            pasted = paste_masks(avg, merged_boxes, merged_valid, oh, ow)
            full_masks = [pasted]

        evaluator.process(
            [rec["image_id"]],
            merged_boxes[None], merged_scores[None],
            merged_classes[None], merged_valid[None],
            masks=full_masks,
        )
    return evaluator.evaluate()

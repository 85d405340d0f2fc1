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

from ..data.transforms import hflip_boxes, test_transform
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


def _tta_variants(cfg, img):
    """All (resized_image, flipped) TTA variants of ``img`` — one resize
    per MIN_SIZE, shared by the detection AND mask passes."""
    oh, ow = img.shape[:2]
    out = []
    for min_size in cfg.TEST.AUG.MIN_SIZES:
        tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
        resized = tf.apply_image(img)
        out.append((resized, False))
        if cfg.TEST.AUG.FLIP:
            out.append((np.ascontiguousarray(resized[:, ::-1]), True))
    return out


def averaged_tta_masks(cfg, mask_fn, variables, img, merged_boxes,
                       merged_scores, merged_classes, merged_valid,
                       variants=None):
    """d2 GeneralizedRCNNWithTTA mask fusion: run the mask branch on the
    MERGED boxes under EVERY (scale, flip) augmentation and average the
    mask PROBABILITIES (ref run_net.py:51-66 — the README's dagger mask
    rows measure exactly this). Returns ((D, S, S) averaged probs, n_aug).

    ``variants``: optional precomputed [(resized_image, flipped)] list —
    run_tta_inference passes the ones it already built for the detection
    pass so each image is not resized twice per scale.
    """
    from ..models.box_head import Detections

    oh, ow = img.shape[:2]
    if variants is None:
        variants = _tta_variants(cfg, img)
    assert variants, "TEST.AUG.MIN_SIZES must be non-empty for TTA"
    prob_sum = None
    n_aug = 0
    for image_v, flipped in variants:
        rh, rw = image_v.shape[:2]
        canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS,
                               required_size_divisibility(cfg))
        padded = pad_to_canvas(image_v.astype(np.float32), canvas)
        sb = merged_boxes.copy()
        sb[:, 0::2] *= rw / ow
        sb[:, 1::2] *= rh / oh
        if flipped:
            sb = hflip_boxes(sb, rw)
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
    return prob_sum / n_aug, n_aug


def run_tta_inference(cfg, model, variables, dataset,
                      max_images=None) -> Dict[str, Dict[str, float]]:
    """Multi-scale + flip TTA eval (ref run_net.py:51-66 semantics).

    TPU-native loop order: SCALES OUTER, images inner. Every scale is
    its own compiled program (static canvas); on the tunneled backend,
    switching programs re-stages the weights (~10s for Swin-L), so the
    reference's per-image variant loop pays 9 program switches PER
    IMAGE (measured 120 s/img on the flagship). Scale-outer runs each
    program over the whole dataset before switching — identical math
    (per-image detections are accumulated across scales, then merged
    with the same class-aware NMS), ~9 switches total.
    """
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

    records = list(dataset.records)
    if max_images is not None:
        records = records[:max_images]
    n_rec = len(records)
    acc = [([], [], [], []) for _ in range(n_rec)]  # boxes/scores/cls/valid
    orig_hw = [None] * n_rec

    flips = (False, True) if cfg.TEST.AUG.FLIP else (False,)
    div = required_size_divisibility(cfg)
    for min_size in cfg.TEST.AUG.MIN_SIZES:
        # issue every forward of this scale ASYNCHRONOUSLY (same compiled
        # program back to back; jax dispatch pipelines them), then sync
        # once — a per-call np.asarray sync costs a full tunnel
        # round-trip on this backend (measured 4.6 s/forward)
        pending = []  # (i, dets, resized_hw, flipped)
        for flipped in flips:
            for i, rec in enumerate(records):
                img = read_image(rec["file_name"], cfg.INPUT.FORMAT)
                oh, ow = img.shape[:2]
                orig_hw[i] = (oh, ow)
                tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
                image_v = tf.apply_image(img)
                if flipped:
                    image_v = np.ascontiguousarray(image_v[:, ::-1])
                rh, rw = image_v.shape[:2]
                canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS, div)
                padded = pad_to_canvas(image_v.astype(np.float32), canvas)
                dets, _ = apply_fn(
                    variables, jnp.asarray(padded[None]),
                    jnp.asarray([[rh, rw]], jnp.int32),
                )
                pending.append((i, dets, (rh, rw), flipped))
        for i, dets, (rh, rw), flipped in pending:
            oh, ow = orig_hw[i]
            b = rescale_boxes(np.asarray(dets.boxes)[0], (rh, rw), (oh, ow))
            if flipped:
                b = hflip_boxes(b, ow)
            acc[i][0].append(b)
            acc[i][1].append(np.asarray(dets.scores)[0])
            acc[i][2].append(np.asarray(dets.classes)[0])
            acc[i][3].append(np.asarray(dets.valid)[0])

    for n, rec in enumerate(records):
        oh, ow = orig_hw[n]
        boxes = np.concatenate(acc[n][0])
        scores = np.concatenate(acc[n][1])
        classes = np.concatenate(acc[n][2])
        valid = np.concatenate(acc[n][3])
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
            img = read_image(rec["file_name"], cfg.INPUT.FORMAT)
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

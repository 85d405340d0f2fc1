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


def tta_batch_for_canvas(cfg, canvas) -> int:
    """Images per compiled TTA program at this canvas: TPU.TTA_BATCH
    capped so batch * canvas-pixels <= TPU.TTA_PIXEL_BUDGET (batch 4 at
    832x1344 is the largest combination the flagship inference bench has
    validated on a 16 GB chip)."""
    cap = max(1, int(cfg.TPU.TTA_BATCH))
    budget = int(cfg.TPU.TTA_PIXEL_BUDGET)
    return max(1, min(cap, budget // (int(canvas[0]) * int(canvas[1]))))


class _BatchedDispatcher:
    """Groups same-canvas TTA items into fixed-size batches, dispatches
    each full batch asynchronously through one compiled program, and
    drains device results in bounded chunks.

    Why: on the tunneled backend a per-call host sync costs a full
    round-trip (~4.6 s measured) and every distinct (canvas, batch)
    shape is its own program; batching amortizes the per-dispatch cost
    across images and keeps one program per canvas. Host memory stays
    bounded: at most one partial batch per canvas is buffered, and
    in-flight device handles are drained every ``drain_every`` batches
    (ADVICE r4: an unbounded pending list over full COCO would rely on
    the backend's own throttling).
    """

    def __init__(self, cfg, run_fn, done_fn, drain_every: int = 16):
        self._cfg = cfg
        self._run = run_fn        # (canvas, images(B,H,W,3), sizes(B,2), metas)
        self._done = done_fn      # (meta, per_image_device_result)
        self._buf = {}            # canvas -> (metas, imgs, sizes)
        self._pending = []        # (metas, batched_result)
        self._drain_every = drain_every

    def add(self, canvas, padded, size_hw, meta):
        metas, imgs, sizes = self._buf.setdefault(tuple(canvas), ([], [], []))
        metas.append(meta)
        imgs.append(padded)
        sizes.append(size_hw)
        if len(metas) >= tta_batch_for_canvas(self._cfg, canvas):
            self._flush_canvas(tuple(canvas))

    def _flush_canvas(self, canvas):
        metas, imgs, sizes = self._buf.pop(canvas)
        bsz = tta_batch_for_canvas(self._cfg, canvas)
        n_real = len(metas)
        while len(imgs) < bsz:  # pad a partial batch (results discarded)
            imgs.append(imgs[0])
            sizes.append(sizes[0])
            metas.append(metas[0])
        out = self._run(
            canvas,
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.asarray(sizes, np.int32)),
            metas,
        )
        self._pending.append((metas[:n_real], out))
        if len(self._pending) >= self._drain_every:
            self.drain()

    def drain(self):
        for metas, out in self._pending:
            host = jax.device_get(out)  # one transfer per batch
            for j, meta in enumerate(metas):
                self._done(meta, jax.tree.map(lambda a: a[j], host))
        self._pending = []

    def finish(self):
        for canvas in list(self._buf):
            self._flush_canvas(canvas)
        self.drain()


def run_tta_inference(cfg, model, variables, dataset,
                      max_images=None) -> Dict[str, Dict[str, float]]:
    """Multi-scale + flip TTA eval (ref run_net.py:51-66 semantics).

    TPU-native loop order: SCALES OUTER, images inner, BATCHED. Every
    (scale-canvas, batch) is one compiled program (static shapes); on
    the tunneled backend, switching programs re-stages the weights
    (~10s for Swin-L), so the reference's per-image variant loop pays 9
    program switches PER IMAGE (measured 120 s/img on the flagship).
    Scale-outer runs each program over the whole dataset before
    switching (~9 switches total), and batching TPU.TTA_BATCH images
    per dispatch amortizes the per-call cost — identical math (each
    batch element is independent; per-image detections accumulate
    across scales, then merge with the same class-aware NMS). The mask
    fusion pass reuses the same scale-outer batched sweep (d2 averages
    mask probabilities over every augmented forward of the MERGED
    boxes). Each image is read + resized once per scale; the flipped
    variant is a view of the cached resize.
    """
    from ..data.coco import read_image
    from ..models.box_head import Detections
    from .inference import paste_masks

    # d2 GeneralizedRCNNWithTTA: "TTA for keypoint is not supported yet"
    assert not cfg.MODEL.KEYPOINT_ON, "TTA for keypoints is not supported"
    tasks = ("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",)
    evaluator = CocoEvaluator(dataset, tasks=tasks)
    apply_fn = jax.jit(lambda v, images, sizes: model.apply(v, images, sizes))
    mask_fn = jax.jit(
        lambda v, images, sizes, dets: model.apply(
            v, images, sizes, given_dets=dets
        )[1]
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

    # ---- detection sweep: scales outer, batched by canvas ----
    def det_done(meta, dets):
        i, (rh, rw), flipped = meta
        oh, ow = orig_hw[i]
        b = rescale_boxes(dets.boxes, (rh, rw), (oh, ow))
        if flipped:
            b = hflip_boxes(b, ow)
        acc[i][0].append(b)
        acc[i][1].append(dets.scores)
        acc[i][2].append(dets.classes)
        acc[i][3].append(dets.valid)

    disp = _BatchedDispatcher(
        cfg, lambda canvas, imgs, sizes, metas: apply_fn(variables, imgs, sizes)[0],
        det_done)
    for min_size in cfg.TEST.AUG.MIN_SIZES:
        for i, rec in enumerate(records):
            img = read_image(rec["file_name"], cfg.INPUT.FORMAT)
            oh, ow = img.shape[:2]
            orig_hw[i] = (oh, ow)
            tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
            resized = tf.apply_image(img)
            rh, rw = resized.shape[:2]
            canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS, div)
            for flipped in flips:
                image_v = (np.ascontiguousarray(resized[:, ::-1])
                           if flipped else resized)
                padded = pad_to_canvas(image_v.astype(np.float32), canvas)
                disp.add(canvas, padded, (rh, rw), (i, (rh, rw), flipped))
    disp.finish()

    # ---- per-image merge (class-aware NMS over all accumulated dets) ----
    merged = [None] * n_rec
    for n in range(n_rec):
        boxes = np.concatenate(acc[n][0])
        scores = np.concatenate(acc[n][1])
        classes = np.concatenate(acc[n][2])
        valid = np.concatenate(acc[n][3])
        mb, ms, mi, mv = merge_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(classes), jnp.asarray(valid),
        )
        merged[n] = (np.asarray(mb), np.asarray(ms),
                     classes[np.asarray(mi)], np.asarray(mv))

    # ---- mask fusion sweep: same scale-outer batched structure over the
    # MERGED boxes (averaged probabilities over every (scale, flip)) ----
    full_masks = [None] * n_rec
    if cfg.MODEL.MASK_ON:
        prob_sum = [None] * n_rec
        n_aug = [0] * n_rec

        def mask_done(meta, masks):
            i, flipped = meta[0], meta[1]
            m = masks  # (D, S, S) probabilities
            if flipped:
                m = m[:, :, ::-1]
            prob_sum[i] = m if prob_sum[i] is None else prob_sum[i] + m
            n_aug[i] += 1

        def mask_run(canvas, imgs, sizes, metas):
            dets_b = Detections(
                boxes=jnp.asarray(np.stack([m[3] for m in metas])),
                scores=jnp.asarray(np.stack([m[4] for m in metas])),
                classes=jnp.asarray(np.stack([m[5] for m in metas])),
                valid=jnp.asarray(np.stack([m[6] for m in metas])),
            )
            return mask_fn(variables, imgs, sizes, dets_b)

        mdisp = _BatchedDispatcher(cfg, mask_run, mask_done)
        for min_size in cfg.TEST.AUG.MIN_SIZES:
            for i, rec in enumerate(records):
                img = read_image(rec["file_name"], cfg.INPUT.FORMAT)
                oh, ow = img.shape[:2]
                tf = test_transform(oh, ow, min_size, cfg.TEST.AUG.MAX_SIZE)
                resized = tf.apply_image(img)
                rh, rw = resized.shape[:2]
                canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS, div)
                mboxes, mscores, mclasses, mvalid = merged[i]
                for flipped in flips:
                    image_v = (np.ascontiguousarray(resized[:, ::-1])
                               if flipped else resized)
                    padded = pad_to_canvas(image_v.astype(np.float32), canvas)
                    sb = mboxes.copy()
                    sb[:, 0::2] *= rw / ow
                    sb[:, 1::2] *= rh / oh
                    if flipped:
                        sb = hflip_boxes(sb, rw)
                    # mask batches must pad with full dets tuples: reuse
                    # the item's own arrays via the meta
                    mdisp.add(canvas, padded, (rh, rw),
                              (i, flipped, None, sb, mscores, mclasses, mvalid))
        mdisp.finish()
        for i in range(n_rec):
            oh, ow = orig_hw[i]
            avg = prob_sum[i] / max(n_aug[i], 1)
            full_masks[i] = paste_masks(avg, merged[i][0], merged[i][3], oh, ow)

    for n, rec in enumerate(records):
        merged_boxes, merged_scores, merged_classes, merged_valid = merged[n]
        evaluator.process(
            [rec["image_id"]],
            merged_boxes[None], merged_scores[None],
            merged_classes[None], merged_valid[None],
            masks=[full_masks[n]] if full_masks[n] is not None else None,
        )
    return evaluator.evaluate()

#!/usr/bin/env python
"""Pseudo-label generation for self-training (the reference's ◇ rows).

The reference's best configs use self-training with the COCO unlabeled
set (README "◇ means self-training with COCO unlabeled dataset"): a
trained detector labels unlabeled images, high-confidence detections
become additional training annotations. This tool runs inference over an
image directory and writes a COCO-format instances json usable directly
by CocoDataset / register_coco_instances.

Usage:
    python tools/generate_pseudo_labels.py --config-file <cfg.yaml> \
        --weights model.msgpack --image-dir datasets/coco/unlabeled2017 \
        --output pseudo_instances.json [--score-thresh 0.9]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--score-thresh", type=float, default=0.9)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--categories-from", default=None,
                   help="COCO annotations json whose categories (official "
                        "ids + names) the pseudo labels should use — "
                        "REQUIRED for training on the union with real "
                        "COCO (contiguous 1..N ids would mislabel "
                        "classes there)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.config import get_cfg
    from afigan_tpu.data.coco import read_image
    from afigan_tpu.engine.inference import paste_masks
    from afigan_tpu.evaluation.rle import encode_mask
    from afigan_tpu.data.transforms import test_transform
    from afigan_tpu.engine.inference import rescale_boxes
    from afigan_tpu.engine.weights import load_weights
    from afigan_tpu.models import build_model
    from afigan_tpu.ops.image_list import (choose_bucket, pad_to_canvas,
                                           required_size_divisibility)

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg, train=False)
    h0, w0 = cfg.TPU.IMAGE_BUCKETS[0]
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h0, w0, 3)), jnp.asarray([[h0, w0]], jnp.int32),
        )
    )()
    variables = load_weights(args.weights, variables, kind="detector")
    apply_fn = jax.jit(lambda v, x, s: model.apply(v, x, s))

    files = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if args.max_images:
        files = files[: args.max_images]

    images, annotations = [], []
    # high base keeps annotation ids collision-free when the json is
    # merged with real COCO annotations (which use smaller ids)
    ann_id = 1 << 28
    if args.categories_from:
        with open(args.categories_from) as f:
            categories = sorted(json.load(f)["categories"], key=lambda c: c["id"])
        assert len(categories) >= cfg.MODEL.ROI_HEADS.NUM_CLASSES, (
            f"{args.categories_from} has {len(categories)} categories < "
            f"NUM_CLASSES {cfg.MODEL.ROI_HEADS.NUM_CLASSES}"
        )
        cat_ids = [c["id"] for c in categories]
    else:
        # standalone use: contiguous ids registerable by CocoDataset.
        # NOT safe to merge with real COCO jsons (pass --categories-from).
        categories = [
            {"id": c, "name": f"class{c}"}
            for c in range(1, cfg.MODEL.ROI_HEADS.NUM_CLASSES + 1)
        ]
        cat_ids = [c["id"] for c in categories]

    for seq, fname in enumerate(files, start=1):
        # COCO unlabeled2017 filenames encode the official image id
        # (000000xxxxxx.jpg) — reuse it so ids don't collide with real
        # train2017 ids when the jsons are merged; otherwise offset.
        stem = os.path.splitext(fname)[0]
        img_id = int(stem) if stem.isdigit() else (1 << 24) + seq
        path = os.path.join(args.image_dir, fname)
        img = read_image(path, cfg.INPUT.FORMAT)
        oh, ow = img.shape[:2]
        tf = test_transform(oh, ow, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
        resized = tf.apply_image(img)
        rh, rw = resized.shape[:2]
        canvas = choose_bucket(rh, rw, cfg.TPU.IMAGE_BUCKETS,
                               required_size_divisibility(cfg))
        padded = pad_to_canvas(resized.astype(np.float32), canvas)

        dets, masks = apply_fn(
            variables, jnp.asarray(padded[None]), jnp.asarray([[rh, rw]], jnp.int32)
        )
        boxes = rescale_boxes(np.asarray(dets.boxes)[0], (rh, rw), (oh, ow))
        scores = np.asarray(dets.scores)[0]
        classes = np.asarray(dets.classes)[0]
        valid = np.asarray(dets.valid)[0] & (scores >= args.score_thresh)

        # MASK_ON: emit segmentations too — a pseudo instance WITHOUT a
        # mask trains the mask head against an all-zero target
        full_masks = None
        if masks is not None:
            full_masks = paste_masks(
                np.asarray(masks)[0], boxes, np.asarray(dets.valid)[0], oh, ow
            )

        images.append({"id": img_id, "file_name": fname, "height": oh, "width": ow})
        for j in np.nonzero(valid)[0]:
            x1, y1, x2, y2 = boxes[j]
            ann = {
                "id": ann_id,
                "image_id": img_id,
                "category_id": int(cat_ids[int(classes[j])]),
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "area": float((x2 - x1) * (y2 - y1)),
                "iscrowd": 0,
                "score": float(scores[j]),
            }
            if full_masks is not None and full_masks[j] is not None:
                rle = encode_mask(full_masks[j])
                ann["segmentation"] = rle
                ann["area"] = float(np.asarray(full_masks[j]).sum())
            annotations.append(ann)
            ann_id += 1

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": categories,
    }
    with open(args.output, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(annotations)} pseudo-labels over {len(images)} images "
          f"to {args.output}")


if __name__ == "__main__":
    main()

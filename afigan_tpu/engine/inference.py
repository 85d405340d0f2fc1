"""Inference runner + host-side postprocessing + TTA (SURVEY §3.1).

Mirrors `run_net.py --eval-only` behavior: jit the model per canvas
bucket, loop the test loader, rescale padded-canvas detections back to
original image coordinates (d2 detector_postprocess), paste 28x28 mask
probabilities into full-image masks (d2 paste_masks_in_image numerics:
bilinear resize into the box, threshold 0.5), feed the COCO evaluator.

TTA (GeneralizedRCNNWithTTA, ref run_net.py:51-66): multi-scale + flip
inference, box merging via NMS over the union of augmented detections.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..evaluation.coco_eval import CocoEvaluator

logger = logging.getLogger("afigan_tpu")


def paste_masks(masks: np.ndarray, boxes: np.ndarray, valid: np.ndarray,
                orig_h: int, orig_w: int, threshold: float = 0.5) -> List[np.ndarray]:
    """(D, S, S) probs + (D, 4) boxes (original coords) → full-size masks."""
    import cv2

    out = []
    for i in range(masks.shape[0]):
        if not valid[i]:
            out.append(None)
            continue
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x1i, y1i = max(x1i, 0), max(y1i, 0)
        x2i, y2i = min(x2i, orig_w), min(y2i, orig_h)
        full = np.zeros((orig_h, orig_w), np.uint8)
        if x2i > x1i and y2i > y1i:
            m = cv2.resize(masks[i].astype(np.float32),
                           (x2i - x1i, y2i - y1i), interpolation=cv2.INTER_LINEAR)
            full[y1i:y2i, x1i:x2i] = (m >= threshold).astype(np.uint8)
        out.append(full)
    return out


def rescale_boxes(boxes: np.ndarray, resized_hw, orig_hw) -> np.ndarray:
    sy = orig_hw[0] / max(resized_hw[0], 1)
    sx = orig_hw[1] / max(resized_hw[1], 1)
    out = boxes.copy()
    out[:, 0::2] = np.clip(out[:, 0::2] * sx, 0, orig_hw[1])
    out[:, 1::2] = np.clip(out[:, 1::2] * sy, 0, orig_hw[0])
    return out


def run_proposal_inference(cfg, model, variables, dataset, batch_size: int = 1,
                           max_images: Optional[int] = None,
                           distributed: bool = False
                           ) -> Dict[str, Dict[str, float]]:
    """Box-proposal AR eval for the ProposalNetwork meta-arch — the
    reference evaluator's first-class "proposals" task
    (ref afigan/evaluation/coco_evaluation.py:145-191,366-474):
    AR@{100,1000} x area buckets over RPN outputs."""
    from ..data.loader import build_test_loader
    from ..evaluation.coco_eval import evaluate_box_proposals

    apply_fn = jax.jit(lambda v, images, sizes: model.apply(v, images, sizes))
    proposals: Dict[int, Dict[str, np.ndarray]] = {}
    seen = 0
    records = None
    if distributed and jax.process_count() > 1:  # pragma: no cover - multihost
        records = dataset.records[jax.process_index()::jax.process_count()]
    for batch in build_test_loader(cfg, dataset, batch_size=batch_size,
                                   records=records):
        out = apply_fn(variables, jnp.asarray(batch["image"]),
                       jnp.asarray(batch["image_sizes"]))
        boxes, scores, valid = (np.asarray(out.proposals), np.asarray(out.scores),
                                np.asarray(out.valid))
        for i in range(boxes.shape[0]):
            if max_images is not None and seen >= max_images:
                break
            if int(batch["image_id"][i]) < 0:  # final-batch padding
                continue
            orig_hw = batch["orig_sizes"][i]
            img_boxes = rescale_boxes(
                boxes[i][valid[i]], batch["image_sizes"][i], orig_hw
            )
            proposals[batch["image_id"][i]] = {
                "boxes": img_boxes, "scores": scores[i][valid[i]],
            }
            seen += 1
        if max_images is not None and seen >= max_images:
            break

    if distributed:
        import jax as _jax

        if _jax.process_count() > 1:  # pragma: no cover - multihost only
            from ..evaluation.coco_eval import allgather_pyobj

            merged: Dict[int, Dict[str, np.ndarray]] = {}
            for d in allgather_pyobj([proposals]):
                merged.update(d)
            proposals = merged

    res = {}
    for limit in (100, 1000):
        for area, suffix in (("all", ""), ("small", "s"), ("medium", "m"),
                             ("large", "l")):
            stats = evaluate_box_proposals(
                proposals, dataset, area=area, limit=limit
            )
            res[f"AR{suffix}@{limit}"] = stats["ar"] * 100
    results = {"box_proposals": res}
    logger.info(
        "box_proposals: " + "  ".join(f"{k}={v:.2f}" for k, v in res.items())
    )
    return results


def make_eval_apply_fn(model, mesh=None):
    """Jitted eval forward; with a mesh, the image batch is sharded over
    the ``data`` axis and outputs are gathered back replicated (the XLA
    all-gather replaces the reference's NCCL eval gather for the
    single-host multi-device case; multi-host striping stays at the
    record level, ref afigan/evaluation/coco_evaluation.py:117-144)."""
    if mesh is None:
        return jax.jit(lambda v, images, sizes: model.apply(v, images, sizes))
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_s = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        lambda v, images, sizes: model.apply(v, images, sizes),
        in_shardings=(None, data_s, data_s),
        out_shardings=repl,
    )


def run_inference(cfg, model, variables, dataset, batch_size: int = 1,
                  max_images: Optional[int] = None,
                  distributed: bool = False,
                  mesh=None) -> Dict[str, Dict[str, float]]:
    """inference_on_dataset + COCOEvaluator.evaluate (ref run_net.py:99-100)."""
    from ..data.loader import build_test_loader

    if cfg.MODEL.META_ARCHITECTURE == "ProposalNetwork":
        return run_proposal_inference(
            cfg, model, variables, dataset, batch_size, max_images,
            distributed=distributed,
        )

    tasks = ["bbox"]
    if cfg.MODEL.MASK_ON:
        tasks.append("segm")
    if cfg.MODEL.KEYPOINT_ON:
        tasks.append("keypoints")
    evaluator = CocoEvaluator(
        dataset, tasks=tuple(tasks), distributed=distributed,
        oks_sigmas=(list(cfg.TEST.KEYPOINT_OKS_SIGMAS) or None),
    )

    apply_fn = make_eval_apply_fn(model, mesh=mesh)

    seen = 0
    records = None
    if distributed and jax.process_count() > 1:  # pragma: no cover - multihost
        # stripe records per rank; CocoEvaluator allgathers predictions
        records = dataset.records[jax.process_index()::jax.process_count()]
    loader = build_test_loader(cfg, dataset, batch_size=batch_size,
                               records=records)
    for batch in loader:
        dets, masks = apply_fn(
            variables, jnp.asarray(batch["image"]), jnp.asarray(batch["image_sizes"])
        )
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid)
        masks_np = np.asarray(masks) if masks is not None else None
        kps_np = (
            np.asarray(dets.keypoints) if dets.keypoints is not None else None
        )

        b = boxes.shape[0]
        for i in range(b):
            if max_images is not None and seen >= max_images:
                break
            if int(batch["image_id"][i]) < 0:  # final-batch padding
                continue
            orig_h, orig_w = batch["orig_sizes"][i]
            resized_hw = batch["image_sizes"][i]
            img_boxes = rescale_boxes(boxes[i], resized_hw, (orig_h, orig_w))
            full_masks = None
            if masks_np is not None:
                pasted = paste_masks(masks_np[i], img_boxes, valid[i], orig_h, orig_w)
                full_masks = [pasted]
            img_kps = None
            if kps_np is not None:
                k = kps_np[i].copy()  # (D, K, 3) resized-canvas coords
                k[..., 0] *= orig_w / max(resized_hw[1], 1)
                k[..., 1] *= orig_h / max(resized_hw[0], 1)
                img_kps = k[None]
            evaluator.process(
                [batch["image_id"][i]], img_boxes[None], scores[i][None],
                classes[i][None], valid[i][None],
                masks=full_masks if full_masks else None,
                keypoints=img_kps,
            )
            seen += 1
        if max_images is not None and seen >= max_images:
            break

    results = evaluator.evaluate()
    for task, metrics in results.items():
        logger.info(f"{task}: " + "  ".join(f"{k}={v:.2f}" for k, v in metrics.items()))
    return results

"""COCO-style AP evaluation — self-contained numpy implementation.

The reference evaluates via pycocotools COCOeval wrapped by its
COCOEvaluator (ref: afigan/evaluation/coco_evaluation.py:477-511);
pycocotools is not in this image, so the framework owns the full
algorithm: greedy score-ordered matching per (image, category) at IoU
thresholds 0.50:0.05:0.95, crowd/area-range ignore handling, 101-point
interpolated precision, AP/AP50/AP75/APs/APm/APl + AR summaries — the
standard COCO protocol, reimplemented from its definition.

`CocoEvaluator` mirrors the d2-style evaluator surface: per-batch
``process(predictions)`` accumulation, distributed gather via
``multihost_utils.process_allgather`` (the NCCL-gather equivalent,
ref :117-144), ``evaluate()`` returning {"bbox": {...}, "segm": {...}}.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

from .rle import encode_mask, rle_area

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = 100


def _bbox_iou_matrix(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """xywh boxes: (D, 4) x (G, 4) -> (D, G); crowd gt → intersection/dt-area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    ix = np.clip(
        np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :]),
        0, None,
    )
    iy = np.clip(
        np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :]),
        0, None,
    )
    inter = ix * iy
    da = (dt[:, 2] * dt[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None, :]
    union = np.where(iscrowd[None, :], da, da + ga - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _segm_iou_matrix(dt_rles: List, gt_rles: List, iscrowd: np.ndarray) -> np.ndarray:
    """Decode-free RLE IoU (run-merge walk; C++ via native/, numpy fallback)."""
    from .rle import rle_iou

    if not dt_rles or not gt_rles:
        return np.zeros((len(dt_rles), len(gt_rles)))
    out = np.zeros((len(dt_rles), len(gt_rles)))
    for j, g in enumerate(gt_rles):
        for i, d in enumerate(dt_rles):
            out[i, j] = rle_iou(d, g, bool(iscrowd[j]))
    return out


def _evaluate_img(dts, gts, ious, area_rng):
    """Greedy matching for one (img, cat, area-range); returns match arrays."""
    T = len(IOU_THRS)
    gt_ig = np.array(
        [g["iscrowd"] or g["area"] < area_rng[0] or g["area"] > area_rng[1] for g in gts],
        dtype=bool,
    ) if gts else np.zeros(0, bool)
    # gts sorted: non-ignored first (stable)
    g_order = np.argsort(gt_ig, kind="stable")
    gt_ig = gt_ig[g_order]
    G = len(gts)
    D = min(len(dts), MAX_DETS)

    dtm = np.zeros((T, D), dtype=np.int64)  # matched gt id (+1) or 0
    dt_ig = np.zeros((T, D), dtype=bool)
    gtm = np.zeros((T, G), dtype=np.int64)

    if G and D:
        ious_s = ious[:D][:, g_order]
        for t, thr in enumerate(IOU_THRS):
            for d in range(D):
                best = thr if thr > 1e-10 else 1e-10
                best = min(best, 1 - 1e-10)
                m = -1
                for g in range(G):
                    if gtm[t, g] > 0 and not gts[g_order[g]]["iscrowd"]:
                        continue
                    # stop at ignored gts once a non-ignored match found
                    if m > -1 and not gt_ig[m] and gt_ig[g]:
                        break
                    if ious_s[d, g] < best:
                        continue
                    best = ious_s[d, g]
                    m = g
                if m == -1:
                    continue
                dt_ig[t, d] = gt_ig[m]
                dtm[t, d] = g_order[m] + 1
                gtm[t, m] = d + 1

    # unmatched dts outside the area range are ignored
    d_areas = np.array([dt["area"] for dt in dts[:D]]) if D else np.zeros(0)
    out_rng = (d_areas < area_rng[0]) | (d_areas > area_rng[1])
    dt_ig = dt_ig | ((dtm == 0) & out_rng[None, :])

    return {
        "dtm": dtm,
        "dt_ig": dt_ig,
        "gt_ig": gt_ig,
        "scores": np.array([dt["score"] for dt in dts[:D]]) if D else np.zeros(0),
    }


class CocoEvalNP:
    """Evaluate detections vs COCO-format GT for one iou_type."""

    def __init__(self, gt_anns: Sequence[Dict], dt_anns: Sequence[Dict],
                 img_ids: Sequence, cat_ids: Sequence, iou_type: str = "bbox"):
        self.iou_type = iou_type
        self.img_ids = list(img_ids)
        self.cat_ids = list(cat_ids)
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for g in gt_anns:
            g.setdefault("iscrowd", 0)
            if "area" not in g:
                g["area"] = g["bbox"][2] * g["bbox"][3]
            self._gts[(g["image_id"], g["category_id"])].append(g)
        for d in dt_anns:
            if "area" not in d:
                # pycocotools protocol: for segm, area-range ignore decisions
                # use the MASK area, not the bbox area (ref coco_evaluation).
                if iou_type == "segm" and "segmentation" in d:
                    d["area"] = float(rle_area(d["segmentation"]))
                else:
                    d["area"] = d["bbox"][2] * d["bbox"][3]
            self._dts[(d["image_id"], d["category_id"])].append(d)

    def run(self) -> Dict[str, float]:
        T, R = len(IOU_THRS), len(REC_THRS)
        K = len(self.cat_ids)
        A = len(AREA_RNG)
        precision = -np.ones((T, R, K, A))
        recall = -np.ones((T, K, A))

        for k, cat in enumerate(self.cat_ids):
            per_img = []
            for img in self.img_ids:
                gts = self._gts.get((img, cat), [])
                dts = sorted(
                    self._dts.get((img, cat), []), key=lambda d: -d["score"]
                )
                if not gts and not dts:
                    per_img.append(None)
                    continue
                iscrowd = np.array([bool(g["iscrowd"]) for g in gts])
                if self.iou_type == "bbox":
                    ious = _bbox_iou_matrix(
                        np.array([d["bbox"] for d in dts[:MAX_DETS]]).reshape(-1, 4),
                        np.array([g["bbox"] for g in gts]).reshape(-1, 4),
                        iscrowd,
                    )
                else:
                    ious = _segm_iou_matrix(
                        [d["segmentation"] for d in dts[:MAX_DETS]],
                        [g["segmentation"] for g in gts],
                        iscrowd,
                    )
                per_img.append(
                    {
                        rng_name: _evaluate_img(dts, gts, ious, rng)
                        for rng_name, rng in AREA_RNG.items()
                    }
                )

            for a, rng_name in enumerate(AREA_RNG):
                evals = [e[rng_name] for e in per_img if e is not None]
                if not evals:
                    continue
                scores = np.concatenate([e["scores"] for e in evals])
                order = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate([e["dtm"] for e in evals], axis=1)[:, order]
                dt_ig = np.concatenate([e["dt_ig"] for e in evals], axis=1)[:, order]
                n_gt = int(sum((~e["gt_ig"]).sum() for e in evals))
                if n_gt == 0:
                    continue
                tps = (dtm > 0) & ~dt_ig
                fps = (dtm == 0) & ~dt_ig
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    rc = tp / n_gt
                    pr = tp / np.maximum(tp + fp, np.spacing(1))
                    recall[t, k, a] = rc[-1] if len(rc) else 0.0
                    # precision envelope (monotone decreasing)
                    q = np.zeros(R)
                    pr = pr.tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[t, :, k, a] = q

        def ap(t=None, area="all"):
            a = list(AREA_RNG).index(area)
            p = precision[:, :, :, a]
            if t is not None:
                p = p[[t]]
            p = p[p > -1]
            return float(np.mean(p)) if p.size else float("nan")

        return {
            "AP": 100 * ap(),
            "AP50": 100 * ap(t=0),
            "AP75": 100 * ap(t=5),
            "APs": 100 * ap(area="small"),
            "APm": 100 * ap(area="medium"),
            "APl": 100 * ap(area="large"),
        }


class CocoEvaluator:
    """Accumulating evaluator with the d2 COCOEvaluator surface."""

    def __init__(self, dataset, tasks=("bbox",), distributed: bool = False):
        """dataset: object with .annotations (COCO gt anns), .img_ids,
        .cat_ids, and .contiguous_to_cat_id mapping."""
        self.dataset = dataset
        self.tasks = tuple(tasks)
        self.distributed = distributed
        self.predictions: List[Dict] = []

    def reset(self):
        self.predictions = []

    def process(self, image_ids, boxes, scores, classes, valid, masks=None,
                mask_threshold: float = 0.5):
        """Accumulate one batch of padded predictions (host numpy arrays).

        boxes: (B, D, 4) xyxy in ORIGINAL image coords; masks: (B, D, H, W)
        float paste-ready full-image masks or None.
        """
        to_cat = self.dataset.contiguous_to_cat_id
        for i, img_id in enumerate(image_ids):
            v = np.asarray(valid[i], dtype=bool)
            for j in np.nonzero(v)[0]:
                x1, y1, x2, y2 = [float(t) for t in np.asarray(boxes[i][j])]
                pred = {
                    "image_id": int(img_id),
                    "category_id": int(to_cat[int(classes[i][j])]),
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "score": float(scores[i][j]),
                }
                if masks is not None:
                    m = np.asarray(masks[i][j]) >= mask_threshold
                    pred["segmentation"] = encode_mask(m.astype(np.uint8))
                self.predictions.append(pred)

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        predictions = self.predictions
        if self.distributed:
            import jax
            from jax.experimental import multihost_utils

            if jax.process_count() > 1:  # pragma: no cover - multihost only
                gathered = multihost_utils.process_allgather(predictions)
                predictions = [p for sub in gathered for p in sub]

        results = {}
        for task in self.tasks:
            gt_anns = self.dataset.annotations
            if task == "segm":
                gt_anns = [self._gt_segm_to_rle(g) for g in gt_anns]
            ev = CocoEvalNP(
                gt_anns, predictions,
                self.dataset.img_ids, self.dataset.cat_ids, iou_type=task,
            )
            results[task] = ev.run()
        return results

    def _gt_segm_to_rle(self, g: Dict) -> Dict:
        """GT polygon segmentations → RLE (pycocotools annToRLE semantics);
        RLE dicts (crowd regions) pass through unchanged."""
        seg = g.get("segmentation")
        if not isinstance(seg, list):
            return g
        from .rle import encode_mask, polygons_to_mask

        h, w = self.dataset.img_hw[g["image_id"]]
        out = dict(g)
        out["segmentation"] = encode_mask(
            polygons_to_mask(seg, int(h), int(w)).astype(np.uint8)
        )
        return out

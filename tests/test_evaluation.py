"""COCO evaluation tests: RLE codec round-trips + AP sanity cases."""

import numpy as np
import pytest

from afigan_tpu.evaluation.rle import (
    counts_to_string,
    decode_rle,
    encode_mask,
    polygons_to_mask,
    string_to_counts,
)
from afigan_tpu.evaluation.coco_eval import CocoEvalNP


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(23, 17) > 0.6).astype(np.uint8)
        rle = encode_mask(m)
        np.testing.assert_array_equal(decode_rle(rle), m)


def test_rle_string_known_value():
    """pycocotools-compatible varint coding survives negative deltas."""
    counts = [0, 5, 100, 3, 250, 7]
    s = counts_to_string(counts)
    assert string_to_counts(s) == counts
    # large values exercise multi-char varints
    counts2 = [100000, 1, 99999, 2]
    assert string_to_counts(counts_to_string(counts2)) == counts2


def test_polygon_rasterization():
    # full-image square
    m = polygons_to_mask([[0, 0, 10, 0, 10, 10, 0, 10]], 12, 12)
    assert m[5, 5] == 1
    assert m[11, 11] == 0
    assert m.sum() >= 100  # ~10x10 square


def _ann(img, cat, box, score=None, iscrowd=0, ann_id=[0]):
    ann_id[0] += 1
    a = {
        "id": ann_id[0],
        "image_id": img,
        "category_id": cat,
        "bbox": list(box),
        "area": box[2] * box[3],
        "iscrowd": iscrowd,
    }
    if score is not None:
        a["score"] = score
    return a


def test_perfect_predictions_give_ap_100():
    gts = [
        _ann(1, 1, [10, 10, 30, 30]),
        _ann(1, 1, [60, 20, 20, 25]),
        _ann(2, 1, [5, 5, 40, 40]),
    ]
    dts = [
        _ann(1, 1, [10, 10, 30, 30], score=0.9),
        _ann(1, 1, [60, 20, 20, 25], score=0.8),
        _ann(2, 1, [5, 5, 40, 40], score=0.95),
    ]
    res = CocoEvalNP(gts, dts, img_ids=[1, 2], cat_ids=[1]).run()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_misses_and_false_positives_lower_ap():
    gts = [_ann(1, 1, [10, 10, 30, 30]), _ann(1, 1, [60, 20, 20, 25])]
    dts = [
        _ann(1, 1, [10, 10, 30, 30], score=0.9),  # hit
        _ann(1, 1, [200, 200, 10, 10], score=0.8),  # FP
    ]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1]).run()
    # recall caps at 0.5; 101-pt AP ≈ 50 (for recall<=0.5 precision 1.0)
    assert 45.0 < res["AP50"] <= 51.0


def test_localization_quality_affects_high_iou_thresholds():
    gts = [_ann(1, 1, [10, 10, 40, 40])]
    # IoU ≈ 0.68 detection: counts at 0.5 but not at 0.75
    dts = [_ann(1, 1, [16, 16, 40, 40], score=0.9)]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1]).run()
    assert res["AP50"] > 90.0
    assert res["AP75"] < 10.0


def test_crowd_gt_not_penalized():
    gts = [
        _ann(1, 1, [10, 10, 30, 30]),
        _ann(1, 1, [100, 100, 50, 50], iscrowd=1),
    ]
    dts = [
        _ann(1, 1, [10, 10, 30, 30], score=0.9),
        _ann(1, 1, [105, 105, 40, 40], score=0.8),  # inside crowd → ignored
    ]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1]).run()
    assert abs(res["AP50"] - 100.0) < 1e-6


def test_segm_iou_path():
    from afigan_tpu.evaluation.rle import encode_mask

    m1 = np.zeros((50, 50), np.uint8)
    m1[10:30, 10:30] = 1
    gts = [dict(_ann(1, 1, [10, 10, 20, 20]), segmentation=encode_mask(m1))]
    dts = [dict(_ann(1, 1, [10, 10, 20, 20], score=0.9), segmentation=encode_mask(m1))]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1], iou_type="segm").run()
    assert abs(res["AP"] - 100.0) < 1e-6


def test_polygon_gt_segm_through_evaluator():
    """CocoEvaluator must rasterize polygon GT to RLE before segm IoU
    (regression: polygon lists used to reach rle_iou unconverted and
    crashed on the first valid detection)."""
    from afigan_tpu.evaluation.coco_eval import CocoEvaluator
    from afigan_tpu.evaluation.rle import encode_mask

    class _DS:
        img_ids = [1]
        cat_ids = [7]
        contiguous_to_cat_id = {0: 7}
        img_hw = {1: (50, 60)}
        annotations = [
            {
                "id": 1, "image_id": 1, "category_id": 7,
                "bbox": [10, 10, 20, 15], "area": 300.0, "iscrowd": 0,
                "segmentation": [[10, 10, 30, 10, 30, 25, 10, 25]],
            }
        ]

    ev = CocoEvaluator(_DS(), tasks=("bbox", "segm"))
    mask = np.zeros((50, 60), np.float32)
    # cv2.fillPoly includes the boundary: the [10,30]x[10,25] polygon
    # rasterizes to rows 10..25, cols 10..30 inclusive
    mask[10:26, 10:31] = 1.0
    ev.process(
        [1],
        boxes=np.array([[[10, 10, 30, 25]]], np.float32),
        scores=np.array([[0.9]], np.float32),
        classes=np.array([[0]], np.int32),
        valid=np.array([[True]]),
        masks=[[mask]],
    )
    res = ev.evaluate()
    assert abs(res["bbox"]["AP"] - 100.0) < 1e-6
    assert abs(res["segm"]["AP"] - 100.0) < 1e-6


def test_ar_maxdet_summaries():
    """AR@1 < AR@10 when 2 GTs exist and the 2nd-ranked dt covers the 2nd
    GT; AP family unchanged vs the single-maxdet protocol."""
    gts = [_ann(1, 1, [0, 0, 10, 10]), _ann(1, 1, [50, 50, 10, 10])]
    dts = [
        _ann(1, 1, [0, 0, 10, 10], score=0.9),
        _ann(1, 1, [50, 50, 10, 10], score=0.8),
    ]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1]).run()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AR@1"] - 50.0) < 1e-6  # only 1 det allowed -> 1/2 GT
    assert abs(res["AR@10"] - 100.0) < 1e-6
    assert abs(res["AR@100"] - 100.0) < 1e-6
    assert abs(res["ARs"] - 100.0) < 1e-6


def test_per_category_ap_table():
    gts = [_ann(1, 1, [0, 0, 10, 10]), _ann(1, 2, [30, 30, 10, 10])]
    dts = [
        _ann(1, 1, [0, 0, 10, 10], score=0.9),       # perfect for cat 1
        _ann(1, 2, [100, 100, 10, 10], score=0.9),   # miss for cat 2
    ]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1, 2],
                     class_names=["cat", "dog"]).run()
    assert abs(res["AP-cat"] - 100.0) < 1e-6
    assert abs(res["AP-dog"] - 0.0) < 1e-6
    assert abs(res["AP"] - 50.0) < 1e-6


def test_keypoints_oks_eval():
    """Perfect keypoint predictions give AP 100; a far-off one gives 0."""
    def kp_ann(img, box, kpts, score=None):
        a = _ann(img, 1, box, score=score)
        a["keypoints"] = kpts
        a["area"] = box[2] * box[3]
        return a

    # 17 keypoints spread inside the box, all labeled
    base = []
    for k in range(17):
        base += [10.0 + 2 * k, 20.0 + k, 2]
    gts = [kp_ann(1, [10, 20, 40, 20], base)]
    dts_good = [kp_ann(1, [10, 20, 40, 20], base, score=0.9)]
    res = CocoEvalNP(gts, dts_good, img_ids=[1], cat_ids=[1],
                     iou_type="keypoints").run()
    assert abs(res["AP"] - 100.0) < 1e-6, res

    far = [v + (300.0 if i % 3 != 2 else 0.0) for i, v in enumerate(base)]
    dts_bad = [kp_ann(1, [10, 20, 40, 20], far, score=0.9)]
    res = CocoEvalNP(gts, dts_bad, img_ids=[1], cat_ids=[1],
                     iou_type="keypoints").run()
    assert res["AP"] == 0.0 or np.isnan(res["AP"]) is False and res["AP"] < 1.0


def test_box_proposal_ar():
    from afigan_tpu.evaluation.coco_eval import evaluate_box_proposals

    class _DS:
        img_ids = [1, 2]
        annotations = [
            _ann(1, 1, [0, 0, 20, 20]),
            _ann(1, 1, [50, 50, 30, 30]),
            _ann(2, 1, [10, 10, 20, 20]),
        ]

    proposals = {
        1: {"boxes": np.array([[0, 0, 20, 20], [48, 48, 82, 82]], np.float32),
            "scores": np.array([0.9, 0.8], np.float32)},
        2: {"boxes": np.array([[200, 200, 220, 220]], np.float32),
            "scores": np.array([0.7], np.float32)},
    }
    res = evaluate_box_proposals(proposals, _DS())
    assert res["num_pos"] == 3
    # gt1 matched at IoU 1.0 (all thresholds), gt2 at IoU ~0.77 (6/10
    # thresholds), gt3 unmatched -> mean recall = (10 + 6 + 0) / 30
    assert abs(res["ar"] - (16 / 30)) < 1e-6
    # limit=1 drops the second proposal on image 1
    res1 = evaluate_box_proposals(proposals, _DS(), limit=1)
    assert abs(res1["ar"] - (10 / 30)) < 1e-6


def test_allgather_pyobj_roundtrip():
    """Bytes-based multihost gather: single-process round trip preserves
    prediction dicts with RLE string counts (the leaves that break
    process_allgather on raw pytrees)."""
    from afigan_tpu.evaluation.coco_eval import allgather_pyobj

    preds = [
        {"image_id": 1, "bbox": [1.0, 2.0, 3.0, 4.0], "score": 0.5,
         "segmentation": {"size": [10, 12], "counts": "b2d1..."}},
        {"image_id": 2, "bbox": [0.0, 0.0, 1.0, 1.0], "score": 0.25},
    ]
    out = allgather_pyobj(preds)
    assert out == preds


def test_segm_area_not_clobbered_by_bbox_task():
    """Sequential bbox-then-segm evaluation over the SAME prediction
    dicts: the segm task's area-range decisions must use the MASK area
    (pycocotools loadRes), not the bbox area the bbox task computed.
    A detection with a large box but a tiny mask must land in APs, not
    APl, for segm."""
    from afigan_tpu.evaluation.rle import encode_mask

    tiny = np.zeros((200, 200), np.uint8)
    tiny[10:40, 10:40] = 1  # 900 px  -> 'small' (< 32^2)
    rle = encode_mask(tiny)

    g = _ann(1, 1, [0, 0, 150, 150])  # big box
    g["segmentation"] = rle
    g["area"] = 900.0  # gt area = mask area (COCO convention)
    d = _ann(1, 1, [0, 0, 150, 150], score=0.9)  # big box, tiny mask
    d["segmentation"] = rle

    # bbox task first: mutated-shared-dict bug wrote bbox w*h into d
    res_bbox = CocoEvalNP([g], [dict(d)], img_ids=[1], cat_ids=[1],
                          iou_type="bbox").run()
    # wait-for-it: run bbox on the SAME dict object, then segm on it
    shared = d
    CocoEvalNP([g], [shared], img_ids=[1], cat_ids=[1], iou_type="bbox").run()
    res_segm = CocoEvalNP([g], [shared], img_ids=[1], cat_ids=[1],
                          iou_type="segm").run()
    assert abs(res_segm["APs"] - 100.0) < 1e-6, res_segm
    assert np.isnan(res_segm["APl"]), res_segm  # no large gt/dt
    # bbox task scores normally too (gt area is the mask area per COCO)
    assert abs(res_bbox["APs"] - 100.0) < 1e-6, res_bbox


def test_keypoints_unlabeled_gt_ignored():
    """pycocotools keypoint protocol: gts with num_keypoints == 0 are
    IGNORED — they don't count toward recall and detections matching
    them are discarded, not scored as TP/FP."""
    def kp_ann(img, box, kpts, score=None, num_kp=None):
        a = _ann(img, 1, box, score=score)
        a["keypoints"] = kpts
        a["area"] = box[2] * box[3]
        if num_kp is not None:
            a["num_keypoints"] = num_kp
        return a

    labeled = []
    for k in range(17):
        labeled += [10.0 + 2 * k, 20.0 + k, 2]
    unlabeled = [0.0, 0.0, 0] * 17

    gts = [
        kp_ann(1, [10, 20, 40, 20], labeled, num_kp=17),
        kp_ann(1, [100, 100, 40, 20], unlabeled, num_kp=0),  # must be ignored
    ]
    # one perfect detection on the labeled gt only
    dts = [kp_ann(1, [10, 20, 40, 20], labeled, score=0.9)]
    res = CocoEvalNP(gts, dts, img_ids=[1], cat_ids=[1],
                     iou_type="keypoints").run()
    # with the unlabeled gt ignored, recall denominator is 1 -> AP 100
    assert abs(res["AP"] - 100.0) < 1e-6, res


def test_oks_fallback_window_matches_pycocotools():
    """For an all-unlabeled gt, computeOks measures distance to the
    window [x0-w, x0+2w] x [y0-h, y0+2h]; keypoints 1-2 box-widths out
    must get OKS < 1 (the old [x0-2w, x0+3w] window gave them 0 dist)."""
    from afigan_tpu.evaluation.coco_eval import _oks_iou_matrix

    gt = {
        "keypoints": [0.0, 0.0, 0] * 17,
        "bbox": [100.0, 100.0, 20.0, 20.0],
        "area": 400.0,
    }
    # detection keypoints at x = 100 - 30 (1.5 widths left of the box)
    kpts = []
    for k in range(17):
        kpts += [70.0, 110.0, 2]
    dt = {"keypoints": kpts}
    oks = _oks_iou_matrix([dt], [gt])[0, 0]
    # pycocotools window starts at x0-w=80 -> dx=10 -> OKS well below 1
    assert oks < 0.99, oks


def test_rle_encode_binarizes_nonunit_foreground():
    """0/255 masks must encode identically to 0/1 masks in BOTH the
    native and numpy paths (the numpy path used to invert polarity)."""
    from afigan_tpu.evaluation.rle import mask_to_rle_counts

    m01 = np.zeros((7, 5), np.uint8)
    m01[0:3, 0] = 1
    m01[2:6, 3] = 1
    m255 = m01 * 255
    assert mask_to_rle_counts(m255) == mask_to_rle_counts(m01)

    # force the numpy fallback regardless of toolchain
    import afigan_tpu.native as native
    import afigan_tpu.evaluation.rle as rle_mod

    real = native.native_encode_counts
    try:
        native.native_encode_counts = lambda m: None
        rle_mod_native = rle_mod.mask_to_rle_counts  # uses ..native import
        # re-call through the module (it imports native_encode_counts
        # inside the function, so the monkeypatch takes effect)
        assert rle_mod.mask_to_rle_counts(m255) == mask_to_rle_counts(m01)
    finally:
        native.native_encode_counts = real


def test_rle_truncated_varint_rejected():
    """A compressed string ending mid-varint (continuation bit set) must
    raise, not silently decode garbage — native and python agree."""
    from afigan_tpu.evaluation.rle import counts_to_string, string_to_counts

    # a lone char with the continuation bit (0x20) set promises another
    # char that never comes
    truncated = counts_to_string([3]) + chr(48 + 0x20)
    assert (ord(truncated[-1]) - 48) & 0x20
    with pytest.raises(Exception):
        string_to_counts(truncated)

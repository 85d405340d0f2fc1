"""Data pipeline tests: COCO parsing, dual-scale mapper, bucketed loader."""

import numpy as np
import pytest

from afigan_tpu.config import get_cfg
from afigan_tpu.data import (
    CocoDataset,
    DatasetMapper,
    TrainingSampler,
    build_train_loader,
    collate_batch,
)
from afigan_tpu.data.transforms import (
    sample_train_transform,
    test_transform as eval_transform,  # alias: bare name would be collected by pytest
)
from tests.fixtures import make_tiny_coco


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    json_path, img_dir = make_tiny_coco(root)
    return CocoDataset(json_path, img_dir)


def _cfg():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.TPU.MASK_CANVAS = 32
    cfg.TPU.IMAGE_BUCKETS = [[64, 128], [128, 128]]  # 64-divisible (canvas contract)
    cfg.MODEL.MASK_ON = True
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


def test_coco_parse(tiny_coco):
    assert len(tiny_coco.records) == 4
    assert tiny_coco.cat_ids == [1, 2, 3]
    r = tiny_coco.records[0]
    assert r["annotations"][0]["bbox"][2] > r["annotations"][0]["bbox"][0]  # XYXY


def test_transform_box_flip_consistency():
    rng = np.random.RandomState(0)
    tf = sample_train_transform(rng, 100, 200, [50], 1000)
    boxes = np.array([[20, 10, 60, 30]], np.float32)
    tb = tf.apply_boxes(boxes)
    assert tb[0, 2] > tb[0, 0] and tb[0, 3] > tb[0, 1]
    # area scales by (sx*sy)
    sx, sy = tf.new_w / 200, tf.new_h / 100
    np.testing.assert_allclose(
        (tb[0, 2] - tb[0, 0]) * (tb[0, 3] - tb[0, 1]),
        40 * 20 * sx * sy, rtol=1e-5,
    )


def test_dual_scale_mapper_consistency(tiny_coco):
    """The x0.5 pipeline must be the SAME transform at half size
    (ref dataset_mapper.py:104-123)."""
    cfg = _cfg()
    mapper = DatasetMapper(cfg, is_train=True, dual_scale=True, seed=3)
    out = mapper(tiny_coco.records[0])
    h, w = out["image"].shape[:2]
    h2, w2 = out["image_x0.5"].shape[:2]
    assert (h2, w2) == (h // 2, w // 2)
    v = out["gt"]["valid"]
    np.testing.assert_allclose(
        out["gt_x0.5"]["boxes"][v], out["gt"]["boxes"][v] / 2, atol=0.6
    )
    np.testing.assert_array_equal(out["gt_x0.5"]["classes"], out["gt"]["classes"])
    # mask canvases are box-relative → shared between scales
    assert out["gt_x0.5"]["masks"] is out["gt"]["masks"]
    # a full-box polygon must fill its canvas center
    first_valid = int(np.nonzero(v)[0][0])
    assert out["gt"]["masks"][first_valid, 16, 16] > 0.5


def test_training_sampler_striping():
    s0 = iter(TrainingSampler(10, seed=1, shard_id=0, num_shards=2))
    s1 = iter(TrainingSampler(10, seed=1, shard_id=1, num_shards=2))
    a = [next(s0) for _ in range(5)]
    b = [next(s1) for _ in range(5)]
    assert sorted(a + b) == list(range(10))  # one epoch covered, disjoint


def test_train_loader_batches(tiny_coco):
    cfg = _cfg()
    loader = build_train_loader(cfg, tiny_coco, dual_scale=True, seed=0)
    batch = next(loader)
    loader.close()
    assert batch["image"].shape[0] == 2
    bh, bw = batch["image"].shape[1:3]
    assert [bh, bw] in cfg.TPU.IMAGE_BUCKETS
    assert batch["image_x0.5"].shape[1:3] == (bh // 2, bw // 2)
    # dual-scale consumers (stages 1-2) only read gt_x0.5; the full-res
    # gt is not collated (its mask canvases are pure copy waste)
    assert "gt" not in batch
    assert batch["gt_x0.5"]["boxes"].shape == (2, 8, 4)
    assert batch["gt_x0.5"]["masks"].shape == (2, 8, 32, 32)
    assert batch["gt_x0.5"]["valid"].any()


def test_train_loader_serial_num_workers_zero(tiny_coco):
    """DATALOADER.NUM_WORKERS=0 (the d2 serial/debug convention) must
    work — ThreadPoolExecutor rejects 0, so the loader clamps to 1."""
    cfg = _cfg()
    cfg.DATALOADER.NUM_WORKERS = 0
    loader = build_train_loader(cfg, tiny_coco, dual_scale=False, seed=0)
    batch = next(loader)
    loader.close()
    assert batch["image"].shape[0] == 2
    assert batch["gt"]["boxes"].shape == (2, 8, 4)


def test_train_loader_propagates_mapper_failure(tiny_coco):
    """A mapper exception must surface at the consumer, not silently end
    the stream as StopIteration."""
    from afigan_tpu.data.loader import PrefetchingLoader

    def bad_mapper(record):
        raise ValueError("corrupt record")

    loader = PrefetchingLoader(
        tiny_coco.records, iter(TrainingSampler(len(tiny_coco.records))),
        bad_mapper, batch_size=2, buckets=[[64, 128]],
    )
    with pytest.raises(RuntimeError, match="producer thread failed"):
        next(loader)
    loader.close()


def test_test_loader_marks_final_batch_padding(tiny_coco):
    """batch_size > len(dataset): padded duplicates carry image_id=-1 so
    evaluators skip them instead of scoring the last image repeatedly."""
    from afigan_tpu.data.loader import build_test_loader

    cfg = _cfg()
    batches = list(build_test_loader(cfg, tiny_coco, batch_size=3))
    n = len(tiny_coco.records)
    ids = np.concatenate([b["image_id"] for b in batches])
    real = ids[ids >= 0]
    assert len(real) == n and len(set(real.tolist())) == n
    assert (ids < 0).sum() == len(ids) - n


def test_crop_transform_geometry():
    """Crop → resize → flip keeps image and box geometry consistent: a
    bright rectangle lands where the transformed box says it should."""
    from afigan_tpu.data.transforms import ResolvedTransform

    img = np.zeros((100, 120, 3), np.float32)
    img[40:60, 70:90] = 255.0  # box (70, 40, 90, 60) xyxy
    tf = ResolvedTransform(100, 120, new_h=60, new_w=80, hflip=True,
                           crop=(20, 30, 80, 90))
    out = tf.apply_image(img)
    assert out.shape == (60, 80, 3)
    tb = tf.apply_boxes(np.array([[70, 40, 90, 60]], np.float32))[0]
    x1, y1, x2, y2 = [int(round(v)) for v in tb]
    inside = out[y1 + 1 : y2 - 1, x1 + 1 : x2 - 1].mean()
    total = out.mean()
    assert inside > 200.0 and total < inside / 2


def test_instance_aware_crop_contains_center():
    from afigan_tpu.data.transforms import sample_crop

    rng = np.random.RandomState(0)
    box = [50.0, 30.0, 70.0, 44.0]  # center (60, 37)
    for _ in range(20):
        y0, x0, ch, cw = sample_crop(rng, "relative", (0.5, 0.5), 100, 120,
                                     instance_box=box)
        assert y0 <= 37 <= y0 + ch and x0 <= 60 <= x0 + cw


def test_color_jitter_changes_pixels_not_geometry():
    from afigan_tpu.data.transforms import ResolvedTransform

    rng = np.random.RandomState(1)
    img = (rng.rand(40, 50, 3) * 255).astype(np.float32)
    plain = ResolvedTransform(40, 50, 40, 50, False)
    jit = ResolvedTransform(40, 50, 40, 50, False,
                            brightness=0.8, contrast=1.2, saturation=0.9)
    a, b = plain.apply_image(img), jit.apply_image(img)
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(
        plain.apply_boxes(np.array([[1, 2, 30, 20]], np.float32)),
        jit.apply_boxes(np.array([[1, 2, 30, 20]], np.float32)),
    )
    # masks (single channel) are never color-jittered
    m = (rng.rand(40, 50) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(
        jit.apply_image(m, interp="nearest"), plain.apply_image(m, interp="nearest")
    )


def test_mapper_crop_enabled_consistency(tiny_coco):
    """INPUT.CROP.ENABLED flows through the dual-scale mapper (the config
    key was a silent no-op in round 1)."""
    from afigan_tpu.config import get_cfg
    from afigan_tpu.data.dataset_mapper import DatasetMapper

    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.TYPE = "relative_range"
    cfg.INPUT.CROP.SIZE = [0.7, 0.7]
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.TPU.MASK_CANVAS = 32
    cfg.MODEL.MASK_ON = True
    mapper = DatasetMapper(cfg, is_train=True, dual_scale=True, seed=3)
    rec = tiny_coco.records[0]
    out = mapper(rec)
    tf = out["transform"]
    assert tf.crop is not None
    h2, w2 = out["image_x0.5"].shape[:2]
    assert (h2, w2) == (out["image"].shape[0] // 2, out["image"].shape[1] // 2)
    assert out["gt"]["valid"].any()


def test_keypoint_transform_flip_swap_and_visibility():
    """apply_keypoints (d2 transform_keypoint_annotations parity, ref
    afigan_utils.py:140-231): coords follow crop/resize/flip; hflip swaps
    left/right identities; out-of-image keypoints lose visibility."""
    from afigan_tpu.data.transforms import ResolvedTransform

    tf = ResolvedTransform(orig_h=100, orig_w=200, new_h=50, new_w=100,
                           hflip=True)
    # 3 keypoints: [left-ish point, right-ish point, unlabeled]
    kp = np.array([[[40.0, 20.0, 2.0], [160.0, 20.0, 1.0], [0.0, 0.0, 0.0]]],
                  np.float32)
    swap = [1, 0, 2]  # left <-> right identity swap on flip
    out = tf.apply_keypoints(kp, hflip_indices=swap)
    # slot 0 now holds the (flipped) former slot-1 point: x = 100 - 160*0.5
    np.testing.assert_allclose(out[0, 0], [100 - 80.0, 10.0, 1.0])
    np.testing.assert_allclose(out[0, 1], [100 - 20.0, 10.0, 2.0])
    # unlabeled keypoint stays zeroed
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0, 0.0])

    # crop pushing a keypoint outside the window zeroes its visibility
    tfc = ResolvedTransform(orig_h=100, orig_w=200, new_h=50, new_w=50,
                            hflip=False, crop=(0, 100, 100, 100))
    out = tfc.apply_keypoints(np.array([[[40.0, 20.0, 2.0],
                                         [160.0, 20.0, 2.0]]], np.float32))
    assert out[0, 0, 2] == 0.0 and tuple(out[0, 0, :2]) == (0.0, 0.0)
    np.testing.assert_allclose(out[0, 1], [30.0, 10.0, 2.0])


def test_resize_zero_means_no_resize():
    """d2 convention: size 0 disables resizing (NoOpTransform)."""
    tf = eval_transform(50, 70, 0, 4000)
    assert (tf.new_h, tf.new_w) == (50, 70)
    img = np.random.RandomState(0).rand(50, 70, 3).astype(np.float32)
    out = tf.apply_image(img)
    assert out.shape == (50, 70, 3)


def test_keypoint_flip_without_indices_raises():
    """d2 transform_keypoint_annotations raises when flipping without
    keypoint_hflip_indices — silent wrong laterality is worse."""
    from afigan_tpu.data.transforms import ResolvedTransform

    tf = ResolvedTransform(40, 40, 40, 40, hflip=True)
    kp = np.zeros((1, 17, 3), np.float32)
    kp[..., 2] = 2
    with pytest.raises(ValueError, match="hflip_indices"):
        tf.apply_keypoints(kp, hflip_indices=None)
    # with indices: fine
    out = tf.apply_keypoints(kp, hflip_indices=list(range(17)))
    assert out.shape == (1, 17, 3)


def test_color_jitter_clips_to_uint8_range():
    """BlendTransform clips to [0, 255] for uint8 sources; brightness
    1.2 on a bright image must not exceed 255."""
    from afigan_tpu.data.transforms import ResolvedTransform

    tf = ResolvedTransform(8, 8, 8, 8, hflip=False, brightness=1.3)
    img = np.full((8, 8, 3), 250, np.float32)
    out = tf.apply_image(img)
    assert out.max() <= 255.0
    tf2 = ResolvedTransform(8, 8, 8, 8, hflip=False, contrast=1.5)
    img2 = np.zeros((8, 8, 3), np.float32)
    img2[0, 0] = 255
    assert tf2.apply_image(img2).min() >= 0.0


def test_saturation_weights_follow_channel_format():
    """RGB images must use reversed grayscale weights vs BGR."""
    from afigan_tpu.data.transforms import ResolvedTransform

    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 200.0  # channel 0 dominant
    bgr = ResolvedTransform(4, 4, 4, 4, False, saturation=0.0, fmt="BGR")
    rgb = ResolvedTransform(4, 4, 4, 4, False, saturation=0.0, fmt="RGB")
    g_bgr = bgr.apply_image(img)[0, 0, 0]   # gray = 0.114 * 200
    g_rgb = rgb.apply_image(img)[0, 0, 0]   # gray = 0.299 * 200
    assert abs(g_bgr - 0.114 * 200) < 1e-3
    assert abs(g_rgb - 0.299 * 200) < 1e-3


def test_sample_crop_off_image_instance_center():
    """Corrupt annotations with centers outside the image must not crash
    the crop sampler (rng.randint low>=high)."""
    from afigan_tpu.data.transforms import sample_crop

    rng = np.random.RandomState(0)
    for _ in range(20):
        y0, x0, ch, cw = sample_crop(
            rng, "relative", (0.5, 0.5), 100, 100,
            instance_box=[90, 990, 110, 1010],  # center y=1000 > h
        )
        assert 0 <= y0 <= 100 - ch and 0 <= x0 <= 100 - cw


def test_make_gt_filters_before_capacity_cap(tiny_coco):
    """Instances invalidated by the transform must not occupy MAX_GT
    slots while valid ones are dropped (d2 filters empty instances
    post-transform, pre-cap)."""
    from afigan_tpu.data.transforms import ResolvedTransform
    from afigan_tpu.data.dataset_mapper import DatasetMapper

    cfg = _cfg()
    cfg.TPU.MAX_GT_BOXES = 2
    mapper = DatasetMapper(cfg, is_train=True, seed=0)
    # synthetic record: 2 out-of-crop boxes first, then 2 in-crop ones
    record = {
        "file_name": tiny_coco.records[0]["file_name"],
        "image_id": 1,
        "annotations": [
            {"bbox": [0, 0, 5, 5], "category_id": 0, "iscrowd": 0},
            {"bbox": [1, 1, 6, 6], "category_id": 0, "iscrowd": 0},
            {"bbox": [60, 60, 80, 80], "category_id": 1, "iscrowd": 0},
            {"bbox": [70, 70, 90, 90], "category_id": 2, "iscrowd": 0},
        ],
    }
    # crop window (50, 50, 50x50) excludes the first two boxes entirely
    tf = ResolvedTransform(100, 100, 50, 50, hflip=False,
                           crop=(50, 50, 50, 50))
    gt, sel = mapper._make_gt(record, tf)
    assert gt["valid"].sum() == 2
    assert set(gt["classes"][gt["valid"]].tolist()) == {1, 2}
    assert list(sel) == [2, 3]


def test_rle_canvas_matches_polygon_canvas():
    """The RLE rasterization path must produce the same box-relative
    canvas as the polygon path for the same rectangle — the RLE branch
    samples the EXACT float box (an integer floor/ceil crop shifted the
    canvas by up to a pixel per edge)."""
    from afigan_tpu.data.dataset_mapper import _rasterize_to_canvas
    from afigan_tpu.data.transforms import ResolvedTransform
    from afigan_tpu.evaluation.rle import encode_mask

    # rectangle [12, 8] .. [43, 29] in a 60x80 image
    m = np.zeros((60, 80), np.uint8)
    m[8:30, 12:44] = 1
    rle = encode_mask(m)
    poly = [[12, 8, 44, 8, 44, 30, 12, 30]]

    tf = ResolvedTransform(60, 80, new_h=45, new_w=60, hflip=False)
    # transformed box has FRACTIONAL coords (scale 0.75): [9, 6, 33, 22.5]
    box = tf.apply_boxes(np.array([[12, 8, 44, 30]], np.float32))[0]
    c_rle = _rasterize_to_canvas(rle, box, 28, tf)
    c_poly = _rasterize_to_canvas(poly, box, 28, tf)
    # same support: the canvases agree except on anti-aliased borders
    inter = ((c_rle > 0.5) & (c_poly > 0.5)).sum()
    union = ((c_rle > 0.5) | (c_poly > 0.5)).sum()
    assert union > 0 and inter / union > 0.9, (inter, union)
    # interiors are fully on
    assert c_rle[10:18, 10:18].min() > 0.9
    assert c_poly[10:18, 10:18].min() > 0.9


def test_choose_bucket_fit_uses_rounded_canvas():
    """Fit must be judged against the ROUNDED canvas: at d=128 a 720px
    image fits the (704 -> 768) bucket; judging by the raw 704 escalated
    to the next (much larger) bucket."""
    from afigan_tpu.ops.image_list import choose_bucket

    buckets = [[704, 704], [1333, 1333]]
    assert choose_bucket(720, 720, buckets, 128) == (768, 768)
    # still escalates when even the rounded canvas is too small
    assert choose_bucket(800, 800, buckets, 128) == (1408, 1408)
    # d=64: unchanged exact-fit behavior
    assert choose_bucket(704, 704, buckets, 64) == (704, 704)


def test_subsample_labels_zero_positive_fraction():
    """d2: num_pos = int(num_samples * pf) EXACTLY — pf=0 samples no
    positives even when positives exist (the old floor forced one)."""
    import jax
    from afigan_tpu.ops.sampling import subsample_labels

    labels = np.full((100,), -1, np.int32)
    labels[:10] = 1   # 10 positives
    labels[50:] = 0   # 50 negatives
    idx, valid = subsample_labels(
        jax.random.PRNGKey(0), np.asarray(labels), 16, 0.0, bg_label=0
    )
    chosen = np.asarray(idx)[np.asarray(valid)]
    assert len(chosen) == 16
    assert (np.asarray(labels)[chosen] == 0).all()  # negatives only


def test_coco_keypoints_loaded_with_half_pixel_shift(tmp_path):
    """d2 load_coco_json adds +0.5 to keypoint x/y (pixel index ->
    continuous coords); visibility stays integral."""
    from tests.fixtures import make_tiny_coco
    import json as jsonlib

    jp, imgd = make_tiny_coco(str(tmp_path), num_images=1, hw=(64, 96),
                              keypoints=True)
    raw = jsonlib.load(open(jp))
    raw_kp = None
    for a in raw["annotations"]:
        if a.get("keypoints") and a.get("num_keypoints", 0) > 0:
            raw_kp = a["keypoints"]
            break
    assert raw_kp is not None
    ds = CocoDataset(jp, imgd)
    for rec in ds.records:
        for o in rec["annotations"]:
            if "keypoints" in o and o["keypoints"][:len(raw_kp)] and any(
                v > 0 for v in o["keypoints"][2::3]
            ):
                got = o["keypoints"]
                assert got[0] == raw_kp[0] + 0.5
                assert got[1] == raw_kp[1] + 0.5
                assert got[2] == raw_kp[2]
                return
    raise AssertionError("no labeled keypoints found in records")


def test_mapper_ships_uint8_unless_color_jitter(tiny_coco):
    """The host pipeline stays uint8 end-to-end (models cast to float32
    in-step, so uint8 transfer is exact while host memcpy and PCIe bytes
    drop 4x); color jitter forces float32 for the WHOLE run so one
    batch never mixes dtypes."""
    cfg = _cfg()
    mapper = DatasetMapper(cfg, is_train=True, dual_scale=True, seed=0)
    out = mapper(tiny_coco.records[0])
    assert out["image"].dtype == np.uint8
    assert out["image_x0.5"].dtype == np.uint8

    # eval path too
    ev = DatasetMapper(cfg, is_train=False)(tiny_coco.records[0])
    assert ev["image"].dtype == np.uint8

    cfg2 = _cfg()
    cfg2.INPUT.COLOR_JITTER.ENABLED = True
    jit = DatasetMapper(cfg2, is_train=True, dual_scale=True, seed=0)
    out2 = jit(tiny_coco.records[0])
    assert out2["image"].dtype == np.float32
    assert out2["image_x0.5"].dtype == np.float32

    # collate preserves uint8 (4x smaller batches on the wire)
    from afigan_tpu.data.loader import collate_batch

    batch = collate_batch(
        [mapper(r) for r in tiny_coco.records[:2]],
        cfg.TPU.IMAGE_BUCKETS, 64, dual_scale=True,
    )
    assert batch["image"].dtype == np.uint8
    assert batch["image_x0.5"].dtype == np.uint8

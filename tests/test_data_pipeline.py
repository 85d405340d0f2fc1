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

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
    cfg.TPU.IMAGE_BUCKETS = [[64, 96], [96, 128], [128, 128]]
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
    assert batch["gt"]["boxes"].shape == (2, 8, 4)
    assert batch["gt"]["masks"].shape == (2, 8, 32, 32)
    assert batch["gt"]["valid"].any()

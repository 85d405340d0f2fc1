"""Integration: AFIGANTrainer (stage 1) + AFExtractorTrainer (stage 2)
on the tiny-COCO fixture — the full progressive pipeline end-to-end,
including the stage-1 → stage-2 → stage-3 weight hand-off."""

import json
import os

import numpy as np
import pytest

from afigan_tpu.config import get_cfg
from afigan_tpu.data import CocoDataset, register_dataset
from tests.fixtures import make_tiny_coco


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_s12"))
    json_path, img_dir = make_tiny_coco(root)
    ds = CocoDataset(json_path, img_dir)
    register_dataset("tiny12_train", lambda: ds)
    register_dataset("tiny12_test", lambda: ds)
    return ds


def _base_cfg(tmp_path, out):
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path / out)
    cfg.DATASETS.TRAIN = ("tiny12_train",)
    cfg.DATASETS.TEST = ("tiny12_test",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    # dual-scale needs canvases divisible by 64
    cfg.TPU.IMAGE_BUCKETS = [[128, 128]]
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.TPU.MASK_CANVAS = 32
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 0
    cfg.MODEL.GUIDE_ARCHITECTURE = "RCNN_FPN_only"
    cfg.MODEL.GUIDE_BACKBONE.NAME = "build_resnet_fpn_backbone"
    return cfg


def test_stage1_then_stage2_pipeline(tiny_dataset, tmp_path):
    from afigan_tpu.engine.trainers import AFExtractorTrainer, AFIGANTrainer

    # ---------- stage 1 ----------
    cfg1 = _base_cfg(tmp_path, "s1")
    t1 = AFIGANTrainer(cfg1)
    t1.train(resume=False)
    g_ckpt = os.path.join(cfg1.OUTPUT_DIR, "G_0", "model_0000002.msgpack")
    d_ckpt = os.path.join(cfg1.OUTPUT_DIR, "D_0", "model_0000002.msgpack")
    assert os.path.isfile(g_ckpt) and os.path.isfile(d_ckpt)
    lines = [json.loads(l) for l in open(os.path.join(cfg1.OUTPUT_DIR, "metrics.json"))]
    assert np.isfinite(lines[-1]["g_loss"]) and np.isfinite(lines[-1]["d_loss"])

    # ---------- stage 2, consuming stage-1 G ----------
    cfg2 = _base_cfg(tmp_path, "s2")
    cfg2.MODEL.META_ARCHITECTURE = "GeneralizedRCNN_AFExtractor"
    cfg2.MODEL.BACKBONE.NAME = "build_resnet_fpn_sr_backbone"
    cfg2.MODEL.MASK_ON = True
    cfg2.MODEL.AFI_GEN_WEIGHTS = g_ckpt
    # in-training EvalHook (ref stage2_trainer.py:208-214): fires at iter 2;
    # half-res eval => test sizes are halved by AFExtractorTrainer.evaluate
    cfg2.TEST.EVAL_PERIOD = 2
    cfg2.INPUT.MIN_SIZE_TEST = 64
    cfg2.INPUT.MAX_SIZE_TEST = 96
    cfg2.TEST.DETECTIONS_PER_IMAGE = 8
    cfg2.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg2.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    t2 = AFExtractorTrainer(cfg2)

    # the stage-1 G must have been transplanted into backbone srf_module
    import jax

    srf = t2.state.det_params["backbone"]["pyramid"]["srf_module"]
    from flax import serialization

    with open(g_ckpt, "rb") as f:
        g_saved = serialization.msgpack_restore(f.read())
    np.testing.assert_array_equal(
        np.asarray(srf["generators_0/head"]["conv"]["kernel"]),
        np.asarray(g_saved["params"]["generators_0/head"]["conv"]["kernel"]),
    )

    t2.train(resume=False)
    det_ckpt = os.path.join(cfg2.OUTPUT_DIR, "AFExtractor", "model_0000002.msgpack")
    assert os.path.isfile(det_ckpt)
    lines = [json.loads(l) for l in open(os.path.join(cfg2.OUTPUT_DIR, "metrics.json"))]
    assert np.isfinite(lines[-1]["total_loss"])
    # the mid-training EvalHook must have produced COCO AP scalars
    eval_keys = {k for l in lines for k in l}
    assert "bbox/AP" in eval_keys, sorted(eval_keys)

    # ---------- stage-3 transplant consumes the stage-2 detector ----------
    from afigan_tpu.engine.trainers import TargetDetectorTrainer

    cfg3 = _base_cfg(tmp_path, "s3")
    cfg3.MODEL.BACKBONE.NAME = "build_resnet_fpn_sr_backbone"
    cfg3.MODEL.MASK_ON = True
    cfg3.MODEL.AF_EXTRACTOR_WEIGHTS = det_ckpt
    t3 = TargetDetectorTrainer(cfg3)
    srf3 = t3.state.params["backbone"]["pyramid"]["srf_module"]
    with open(det_ckpt, "rb") as f:
        det_saved = serialization.msgpack_restore(f.read())
    np.testing.assert_array_equal(
        np.asarray(srf3["generators_0/tail"]["conv"]["kernel"]),
        np.asarray(
            det_saved["params"]["backbone"]["pyramid"]["srf_module"][
                "generators_0/tail"]["conv"]["kernel"]
        ),
    )

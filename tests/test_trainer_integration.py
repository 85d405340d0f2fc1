"""Integration: TargetDetectorTrainer end-to-end on the tiny-COCO fixture.

Covers the full host stack: dataset registration → dual/single-scale
mapper → prefetching loader → jitted train step → hooks (timer, writer,
periodic checkpoint) → metrics.json → resume; plus run_inference eval.
"""

import json
import os

import numpy as np
import pytest

from afigan_tpu.config import get_cfg
from afigan_tpu.data import CocoDataset, register_dataset
from tests.fixtures import make_tiny_coco


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_it"))
    json_path, img_dir = make_tiny_coco(root)
    ds = CocoDataset(json_path, img_dir)
    register_dataset("tiny_coco_train", lambda: ds)
    register_dataset("tiny_coco_test", lambda: ds)
    return ds


def _tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/Base-RCNN-FPN-AFIGAN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.DATASETS.TRAIN = ("tiny_coco_train",)
    cfg.DATASETS.TEST = ("tiny_coco_test",)
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.IMAGE_BUCKETS = [[64, 96], [96, 96]]
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.TPU.MASK_CANVAS = 32
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 0
    return cfg


def test_stage3_trainer_end_to_end(tiny_dataset, tmp_path):
    from afigan_tpu.engine.trainers import TargetDetectorTrainer

    cfg = _tiny_cfg(tmp_path)
    trainer = TargetDetectorTrainer(cfg, )
    trainer.train(resume=False)

    # metrics.json written with finite losses
    metrics_path = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    assert os.path.isfile(metrics_path)
    lines = [json.loads(l) for l in open(metrics_path)]
    assert lines and np.isfinite(lines[-1]["total_loss"])
    # checkpoint saved at iter 2
    assert os.path.isfile(os.path.join(cfg.OUTPUT_DIR, "model_0000002.msgpack"))

    # resume picks up the checkpoint
    trainer2 = TargetDetectorTrainer(cfg)
    st = trainer2.state
    from afigan_tpu.engine.checkpoint import resume_or_load
    import jax

    tpl = {
        "params": jax.device_get(st.params),
        "batch_stats": jax.device_get(st.stats),
        "opt": jax.device_get(st.opt),
        "step": np.int32(0),
    }
    loaded, ok = resume_or_load(cfg.OUTPUT_DIR, tpl)
    assert ok and int(loaded["step"]) == 2


def test_inference_eval_pipeline(tiny_dataset, tmp_path):
    import jax
    import jax.numpy as jnp

    from afigan_tpu.engine.inference import run_inference
    from afigan_tpu.models import build_model

    cfg = _tiny_cfg(tmp_path)
    model = build_model(cfg, train=False)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 96, 3)), jnp.asarray([[64, 96]], jnp.int32),
        )
    )()
    results = run_inference(cfg, model, variables, tiny_dataset)
    assert "bbox" in results and "segm" in results
    assert np.isfinite(results["bbox"]["AP"]) or results["bbox"]["AP"] != results["bbox"]["AP"]


def test_precise_bn_hook_updates_stats(tiny_dataset, tmp_path):
    """TEST.PRECISE_BN wiring (round-1 gap: the algorithm existed but no
    trainer used it): a BN-normed detector's running stats are replaced
    by true batch averages."""
    import jax

    from afigan_tpu.engine.trainers import TargetDetectorTrainer

    cfg = _tiny_cfg(tmp_path / "pbn")
    cfg.MODEL.FPN.NORM = "BN"  # gives the detector batch_stats
    cfg.TEST.PRECISE_BN.ENABLED = True
    cfg.TEST.PRECISE_BN.NUM_ITER = 2
    cfg.TEST.EVAL_PERIOD = 2

    t = TargetDetectorTrainer(cfg)
    assert t._bn_stats(), "expected BN stats in the detector state"
    assert t._precise_bn_hook() is not None
    before = jax.tree.leaves(jax.device_get(t.state.stats))
    t.run_precise_bn(2)
    after = jax.tree.leaves(jax.device_get(t.state.stats))
    diffs = [float(np.abs(a - b).max()) for a, b in zip(after, before)]
    assert max(diffs) > 1e-6, "precise BN left all stats unchanged"
    assert all(np.isfinite(a).all() for a in after)

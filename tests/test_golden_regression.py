"""End-to-end golden regression: pinned detections + pinned COCO AP.

The analog of d2's dev/run_*_tests.sh tiny-COCO fixture (SURVEY §4,
VERDICT round-1 task #1b): a fixed-seed Mask R-CNN R-50-FPN+AFI runs
inference over the committed tiny-COCO fixture; the resulting detections
(boxes/scores/classes) on the first image AND the end-to-end box/mask AP
are pinned against golden values committed under tests/golden/.

Breaking ANY of matcher thresholds / box transforms / NMS ordering /
pooler numerics / mask pasting / the evaluator changes these values —
making the <=0.3-AP parity gate falsifiable in-repo.

Regenerate after an INTENTIONAL numerics change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden_regression.py -q
and commit the updated tests/golden/detector_golden.npz with a note in
the commit message on why the numerics changed.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afigan_tpu.config import get_cfg
from afigan_tpu.data.coco import CocoDataset
from afigan_tpu.engine.inference import run_inference
from afigan_tpu.models import build_model

from tests.fixtures import make_tiny_coco

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "detector_golden.npz")


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file("/root/reference/configs/Base-RCNN-FPN-AFIGAN.yaml")
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3  # fixture categories
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0  # random weights score ~1/C
    # Normalize inputs: with the d2-Caffe2 PIXEL_STD=1 default, raw 0-255
    # pixels through RANDOM-init weights blow up the RPN deltas and every
    # decoded proposal clips to a zero-width sliver (no valid detections —
    # nothing to pin). Real checkpoints expect STD=1; random ones don't.
    cfg.MODEL.PIXEL_STD = (57.375, 57.12, 58.395)
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.IMAGE_BUCKETS = ((128, 128),)
    return cfg


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("goldencoco")
    json_path, img_dir = make_tiny_coco(str(root), num_images=4, hw=(96, 128))
    return CocoDataset(json_path, img_dir)


def test_detector_golden_regression(fixture_dataset):
    cfg = _cfg()
    model = build_model(cfg, train=False)

    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()

    # --- pinned raw detections on a fixed synthetic image ---
    rng = np.random.RandomState(42)
    img = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 255.0)
    dets, masks = jax.jit(lambda v: model.apply(v, img, sizes))(variables)
    boxes = np.asarray(dets.boxes[0], np.float32)
    scores = np.asarray(dets.scores[0], np.float32)
    classes = np.asarray(dets.classes[0], np.int32)
    valid = np.asarray(dets.valid[0])
    mask_sum = np.asarray(jnp.sum(masks[0], axis=(1, 2)), np.float32)

    # --- pinned end-to-end AP over the fixture through the real eval path ---
    results = run_inference(cfg, model, variables, fixture_dataset, batch_size=1)
    ap = np.array(
        [results["bbox"]["AP"], results["bbox"]["AP50"],
         results["segm"]["AP"], results["segm"]["AP50"]],
        np.float64,
    )

    current = dict(boxes=boxes, scores=scores, classes=classes,
                   valid=valid.astype(np.int8), mask_sum=mask_sum, ap=ap)

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **current)
        pytest.skip(f"golden regenerated at {GOLDEN}; commit it")

    want = np.load(GOLDEN)
    np.testing.assert_array_equal(valid.astype(np.int8), want["valid"], "valid")
    np.testing.assert_array_equal(classes[valid], want["classes"][want["valid"] > 0],
                                  "classes")
    np.testing.assert_allclose(scores[valid], want["scores"][want["valid"] > 0],
                               rtol=0, atol=1e-3, err_msg="scores")
    np.testing.assert_allclose(boxes[valid], want["boxes"][want["valid"] > 0],
                               rtol=0, atol=0.05, err_msg="boxes(px)")
    np.testing.assert_allclose(mask_sum[valid], want["mask_sum"][want["valid"] > 0],
                               rtol=5e-3, atol=5e-3, err_msg="mask_sum")
    np.testing.assert_allclose(ap, want["ap"], rtol=0, atol=1e-3,
                               err_msg="AP [bbox AP, bbox AP50, segm AP, segm AP50]")


# ---------------------------------------------------------------------------
# Round-3 (VERDICT #9): pinned goldens for the OTHER model families, so a
# numerics regression in PAFPN/Cascade or FCOS is caught the same way as
# R-50-FPN Mask R-CNN.
# ---------------------------------------------------------------------------

def _pin_detections(name, model, variables, cfg, fixture_dataset,
                    with_masks: bool):
    golden = os.path.join(os.path.dirname(__file__), "golden", f"{name}.npz")
    rng = np.random.RandomState(42)
    img = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 255.0)
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    dets, masks = jax.jit(lambda v: model.apply(v, img, sizes))(variables)
    current = dict(
        boxes=np.asarray(dets.boxes[0], np.float32),
        scores=np.asarray(dets.scores[0], np.float32),
        classes=np.asarray(dets.classes[0], np.int32),
        valid=np.asarray(dets.valid[0]).astype(np.int8),
    )
    if with_masks and masks is not None:
        current["mask_sum"] = np.asarray(jnp.sum(masks[0], axis=(1, 2)), np.float32)

    results = run_inference(cfg, model, variables, fixture_dataset, batch_size=1)
    current["ap"] = np.array(
        [results["bbox"]["AP"], results["bbox"]["AP50"]], np.float64
    )

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(golden):
        os.makedirs(os.path.dirname(golden), exist_ok=True)
        np.savez(golden, **current)
        pytest.skip(f"golden regenerated at {golden}; commit it")

    want = np.load(golden)
    valid = current["valid"] > 0
    np.testing.assert_array_equal(current["valid"], want["valid"], "valid")
    np.testing.assert_array_equal(
        current["classes"][valid], want["classes"][want["valid"] > 0], "classes"
    )
    np.testing.assert_allclose(
        current["scores"][valid], want["scores"][want["valid"] > 0],
        rtol=0, atol=1e-3, err_msg="scores",
    )
    np.testing.assert_allclose(
        current["boxes"][valid], want["boxes"][want["valid"] > 0],
        rtol=0, atol=0.05, err_msg="boxes(px)",
    )
    if "mask_sum" in current:
        np.testing.assert_allclose(
            current["mask_sum"][valid], want["mask_sum"][want["valid"] > 0],
            rtol=5e-3, atol=5e-3, err_msg="mask_sum",
        )
    np.testing.assert_allclose(current["ap"], want["ap"], rtol=0, atol=1e-3,
                               err_msg="AP [bbox AP, bbox AP50]")


def test_pafpn_cascade_golden_regression(fixture_dataset):
    """PAFPN + CascadeROIHeads (the S-101-PAFPN family's head/pyramid
    combination, on R-50 for fixture speed)."""
    cfg = _cfg()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.BACKBONE.NAME = "build_resnet_pafpn_sr_backbone"
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    model = build_model(cfg, train=False)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    _pin_detections("pafpn_cascade_golden", model, variables, cfg,
                    fixture_dataset, with_masks=False)


def test_fcos_golden_regression(fixture_dataset):
    """FCOS R-50-FPN+AFI (BASELINE target family)."""
    cfg = _cfg()
    cfg.merge_from_file("/root/repo/configs/inference/AFI-GAN_fcos_R_50_FPN.yaml")
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.FCOS.NUM_CLASSES = 3
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.MODEL.FCOS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.PIXEL_STD = (57.375, 57.12, 58.395)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.IMAGE_BUCKETS = ((128, 128),)
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    model = build_model(cfg, train=False)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    _pin_detections("fcos_golden", model, variables, cfg,
                    fixture_dataset, with_masks=False)

"""TTA end-to-end: multi-scale + flip inference with merged-box masks."""

import numpy as np
import pytest

from afigan_tpu.config import get_cfg
from afigan_tpu.data import CocoDataset, register_dataset
from tests.fixtures import make_tiny_coco


def test_tta_inference(tmp_path):
    import jax
    import jax.numpy as jnp

    from afigan_tpu.engine.tta import run_tta_inference
    from afigan_tpu.models import build_model

    json_path, img_dir = make_tiny_coco(str(tmp_path), num_images=2, hw=(64, 96))
    ds = CocoDataset(json_path, img_dir)

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = True
    cfg.TPU.IMAGE_BUCKETS = [[64, 96], [96, 96], [128, 128]]

    model = build_model(cfg, train=False)
    h, w = 64, 96
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
        )
    )()
    results = run_tta_inference(cfg, model, variables, ds)
    assert "bbox" in results and "segm" in results
    # APs are numbers (possibly 0/nan for a random model) — the pipeline ran
    for task in results.values():
        assert {"AP", "AP50", "AP75", "APs", "APm", "APl",
                "AR@1", "AR@10", "AR@100"} <= set(task)

    # ---- d2-faithful mask fusion: the averaged TTA mask must combine
    # MULTIPLE augmented forwards (differ from any single-aug run) ----
    from afigan_tpu.engine.tta import averaged_tta_masks
    from afigan_tpu.data.coco import read_image

    mask_fn = jax.jit(
        lambda v, images, sizes, dets: model.apply(v, images, sizes, given_dets=dets)
    )
    img = read_image(ds.records[0]["file_name"], cfg.INPUT.FORMAT)
    boxes = np.array([[8.0, 8.0, 50.0, 40.0], [20.0, 10.0, 80.0, 60.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    valid = np.array([True, True])

    avg_multi, n_multi = averaged_tta_masks(
        cfg, mask_fn, variables, img, boxes, scores, classes, valid)
    assert n_multi == 4  # 2 scales x (id + flip)

    cfg_single = cfg.clone()
    cfg_single.defrost()
    cfg_single.TEST.AUG.MIN_SIZES = (64,)
    cfg_single.TEST.AUG.FLIP = False
    cfg_single.freeze()
    avg_single, n_single = averaged_tta_masks(
        cfg_single, mask_fn, variables, img, boxes, scores, classes, valid)
    assert n_single == 1
    # the fused probabilities genuinely mix augmentations
    assert not np.allclose(avg_multi, avg_single, atol=1e-4)
    assert float(np.abs(avg_multi - avg_single).max()) > 1e-3


def test_tta_batching_matches_batch1(tmp_path):
    """TPU.TTA_BATCH>1 is a pure dispatch-shape change: batching images
    into one compiled (scale, canvas) program must produce the same
    merged detections and APs as batch-1 (each batch element is
    processed independently; partial batches are padded and sliced)."""
    import jax
    import jax.numpy as jnp

    from afigan_tpu.engine.tta import run_tta_inference
    from afigan_tpu.models import build_model

    json_path, img_dir = make_tiny_coco(str(tmp_path), num_images=3, hw=(64, 96))
    ds = CocoDataset(json_path, img_dir)

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = True
    cfg.TPU.IMAGE_BUCKETS = [[64, 96], [96, 96], [128, 128]]

    model = build_model(cfg, train=False)
    h, w = 64, 96
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
        )
    )()

    results = {}
    for batch in (1, 4):  # 4 > n_images at some canvases -> partial pad
        c = cfg.clone()
        c.defrost()
        c.TPU.TTA_BATCH = batch
        c.TPU.TTA_PIXEL_BUDGET = 10**9
        c.freeze()
        results[batch] = run_tta_inference(c, model, variables, ds)
    for task in results[1]:
        for k, v1 in results[1][task].items():
            v4 = results[4][task][k]
            if np.isnan(v1) and np.isnan(v4):
                continue
            assert v4 == pytest.approx(v1, abs=1e-6), (task, k, v1, v4)


def test_tta_batch_for_canvas_pixel_budget():
    """Effective TTA batch = min(cap, budget // canvas_pixels), >= 1:
    big canvases fall back to batch 1 instead of risking HBM."""
    from afigan_tpu.engine.tta import tta_batch_for_canvas

    cfg = get_cfg()
    cfg.TPU.TTA_BATCH = 8
    cfg.TPU.TTA_PIXEL_BUDGET = 4_500_000
    assert tta_batch_for_canvas(cfg, (448, 768)) == 8      # small: cap wins
    assert tta_batch_for_canvas(cfg, (832, 1344)) == 4     # flagship-validated
    assert tta_batch_for_canvas(cfg, (1408, 2304)) == 1    # big: floor at 1
    cfg.TPU.TTA_BATCH = 1
    assert tta_batch_for_canvas(cfg, (448, 768)) == 1      # batch-1 mode

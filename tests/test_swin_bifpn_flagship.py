"""Flagship config family smoke: Swin-T(iny dims) + BiFPN(AFI) + Cascade.

Builds from the reference's Swin-BiFPN YAML (shrunk) and runs train +
inference forwards — exercises Swin window attention/shift/merging, the
BiFPN rolled repeat with shared AFI upsampling, and cascade heads on
p3-p7 together.
"""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.models import build_model
from afigan_tpu.models.roi_heads import GroundTruth


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/inference/AFI-GAN_cascade_rcnn_swint_BiFPN_ST.yaml"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # shrink swin
    cfg.MODEL.SWINT.EMBED_DIM = 24
    cfg.MODEL.SWINT.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.SWINT.NUM_HEADS = [1, 2, 4, 8]
    cfg.MODEL.SWINT.WINDOW_SIZE = 4
    cfg.MODEL.BIFPN.OUT_CHANNELS = 32
    cfg.MODEL.BIFPN.FPN_REPEAT = 2
    cfg.MODEL.BIFPN.NORM = "BN"
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_BOX_HEAD.NORM = "BN"
    cfg.MODEL.ROI_MASK_HEAD.NORM = "BN"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    return cfg


def test_swin_bifpn_cascade_train_and_infer():
    cfg = _cfg()
    h = w = 128  # 128 = window 4 x patch 4 x strides
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32) * 255
    )
    sizes = jnp.asarray([[h, w]], jnp.int32)
    gt = GroundTruth(
        boxes=jnp.asarray([[[16.0, 16.0, 90.0, 80.0], [0, 0, 0, 0]]]),
        classes=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
    )
    model = build_model(cfg, train=True)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            images, sizes, gt,
        )
    )()
    # shared srf_module inside the BiFPN; swin param tree present
    assert "srf_module" in variables["params"]["backbone"]["pyramid"]
    assert "patch_embed" in variables["params"]["backbone"]["bottom_up"]
    losses, _ = jax.jit(
        lambda v, r1, r2: model.apply(
            v, images, sizes, gt, rngs={"sampling": r1, "dropout": r2},
            mutable=["batch_stats"],
        )
    )(variables, jax.random.PRNGKey(3), jax.random.PRNGKey(4))
    for stage in range(3):
        assert np.isfinite(float(losses[f"loss_cls_stage{stage}"]))

    model_e = build_model(cfg, train=False)
    var_e = jax.jit(
        lambda: model_e.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model_e.apply(v, images, sizes))(var_e)
    assert dets.boxes.shape == (1, 8, 4)
    assert masks is None


def test_flagship_swinL_tta_config_and_eval(tmp_path):
    """FLAGSHIP (BASELINE config #5): the Swin-L + BiFPN + Cascade + TTA
    YAML builds, trains one step, and runs multi-scale TTA eval end-to-end
    (tiny dims / tiny fixture; ref README.md:48 — the 57.3 ◇† row)."""
    from afigan_tpu.data import CocoDataset
    from afigan_tpu.engine.tta import run_tta_inference
    from tests.fixtures import make_tiny_coco

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/inference/AFI-GAN_cascade_rcnn_swinL_BiFPN_ST_TTA.yaml"
    )
    # flagship wiring asserted at full scale...
    assert cfg.TEST.AUG.ENABLED and cfg.TEST.AUG.FLIP
    assert cfg.MODEL.SWINT.EMBED_DIM == 192
    assert cfg.MODEL.SWINT.DEPTHS == [2, 2, 18, 2]
    assert cfg.MODEL.SWINT.WINDOW_SIZE == 12
    assert cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads"
    assert cfg.MODEL.BACKBONE.NAME == "build_swint_bifpn_sr_backbone"
    # ...then shrunk for the smoke run
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SWINT.EMBED_DIM = 24
    cfg.MODEL.SWINT.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.SWINT.NUM_HEADS = [1, 2, 4, 8]
    cfg.MODEL.SWINT.WINDOW_SIZE = 4
    cfg.MODEL.BIFPN.OUT_CHANNELS = 32
    cfg.MODEL.BIFPN.FPN_REPEAT = 2
    cfg.MODEL.BIFPN.NORM = "BN"
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_BOX_HEAD.NORM = "BN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    # p7 is stride 128 — keep every TTA scale >= 128 so p7 stays nonempty
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.TEST.AUG.MIN_SIZES = (128, 192)
    cfg.TEST.AUG.MAX_SIZE = 384
    cfg.TPU.IMAGE_BUCKETS = [[128, 256], [256, 256], [256, 384]]

    # one train step at tiny scale
    h = w = 128
    images = jnp.asarray(
        np.random.RandomState(1).rand(1, h, w, 3).astype(np.float32) * 255
    )
    sizes = jnp.asarray([[h, w]], jnp.int32)
    gt = GroundTruth(
        boxes=jnp.asarray([[[16.0, 16.0, 90.0, 80.0], [0, 0, 0, 0]]]),
        classes=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
    )
    model_t = build_model(cfg, train=True)
    vars_t = jax.jit(
        lambda: model_t.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            images, sizes, gt,
        )
    )()
    losses, _ = jax.jit(
        lambda v, r1, r2: model_t.apply(
            v, images, sizes, gt, rngs={"sampling": r1, "dropout": r2},
            mutable=["batch_stats"],
        )
    )(vars_t, jax.random.PRNGKey(3), jax.random.PRNGKey(4))
    assert np.isfinite(float(sum(jax.tree.leaves(losses))))

    # multi-scale TTA eval on the tiny fixture
    json_path, img_dir = make_tiny_coco(str(tmp_path), num_images=2, hw=(64, 96))
    ds = CocoDataset(json_path, img_dir)
    model_e = build_model(cfg, train=False)
    vars_e = jax.jit(
        lambda: model_e.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 128, 256, 3)), jnp.asarray([[128, 192]], jnp.int32),
        )
    )()
    results = run_tta_inference(cfg, model_e, vars_e, ds)
    assert "bbox" in results and np.isfinite(results["bbox"]["AP"] or 0.0)

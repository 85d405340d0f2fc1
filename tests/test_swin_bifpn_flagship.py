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

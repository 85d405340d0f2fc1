"""End-to-end GeneralizedRCNN forward tests (tiny shapes, CPU).

Builds models straight from the reference YAML zoo (config-compat check)
and runs training + inference forwards with padded GT — the jit-side
contract of the whole detector stack.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.models import GroundTruth, build_model

REF = "/root/reference/configs"


def _tiny_cfg(mask_on=True):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REF, "Base-RCNN-FPN-AFIGAN.yaml"))
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # shrink for CPU test speed
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    return cfg


def _fake_batch(b=1, h=64, w=64, m=4):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[h - 8, w - 16]] * b, dtype=jnp.int32)
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [10, 10, 60, 50]
    boxes[:, 1] = [30, 40, 100, 90]
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((b, m), np.int32)),
        valid=jnp.asarray(np.array([[True, True, False, False]] * b)),
        masks=jnp.asarray(rng.rand(b, m, 28, 28).astype(np.float32)),
    )
    return images, sizes, gt


def test_train_forward_losses():
    cfg = _tiny_cfg()
    model = build_model(cfg, train=True)
    images, sizes, gt = _fake_batch()
    # init/apply must run under jit: this environment pays ~5s per XLA
    # compile, so eager (op-by-op) init would take hours.
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            images, sizes, gt,
        )
    )()
    losses = jax.jit(
        lambda v, r: model.apply(v, images, sizes, gt, rngs={"sampling": r})
    )(variables, jax.random.PRNGKey(2))
    expected = {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg", "loss_mask"}
    # diag_* entries are monitoring-only (excluded from total_loss by
    # the stage steps) — loss keys proper must match exactly
    assert expected == {k for k in losses if not k.startswith("diag_")}, (
        losses.keys())
    assert 0.0 <= float(losses["diag_fg_frac"]) <= 1.0
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert "srf_module" in variables["params"]["backbone"]["pyramid"]


def test_inference_forward_detections():
    cfg = _tiny_cfg()
    model = build_model(cfg, train=False)
    images, sizes, gt = _fake_batch()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model.apply(v, images, sizes))(variables)
    b, d = dets.scores.shape
    assert d == cfg.TEST.DETECTIONS_PER_IMAGE
    assert dets.boxes.shape == (b, d, 4)
    assert dets.classes.shape == (b, d)
    assert masks.shape == (b, d, 28, 28)
    assert masks.min() >= 0 and masks.max() <= 1


def test_cascade_heads_build_and_run():
    cfg = _tiny_cfg(mask_on=False)
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    model = build_model(cfg, train=True)
    images, sizes, gt = _fake_batch()
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            images, sizes, gt,
        )
    )()
    losses = jax.jit(
        lambda v, r: model.apply(v, images, sizes, gt, rngs={"sampling": r})
    )(variables, jax.random.PRNGKey(2))
    for stage in range(3):
        assert f"loss_cls_stage{stage}" in losses
        assert f"loss_box_reg_stage{stage}" in losses
    # inference too
    model_e = build_model(cfg, train=False)
    var_e = jax.jit(
        lambda: model_e.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model_e.apply(v, images, sizes))(var_e)
    assert dets.boxes.shape[1] == cfg.TEST.DETECTIONS_PER_IMAGE


def test_res5_c4_heads_build_and_run():
    """d2 default C4 config shape: RPN on res4 + Res5ROIHeads."""
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"  # bottom_up only used
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p4"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[64, 128]]
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p4"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    cfg.MODEL.MASK_ON = True
    model = build_model(cfg, train=True)
    images, sizes, gt = _fake_batch()
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            images, sizes, gt,
        )
    )()
    assert "res5/block0" in variables["params"]["roi_heads"]
    losses = jax.jit(
        lambda v, r: model.apply(v, images, sizes, gt, rngs={"sampling": r})
    )(variables, jax.random.PRNGKey(2))
    assert {"loss_cls", "loss_box_reg", "loss_mask"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    model_e = build_model(cfg, train=False)
    var_e = jax.jit(
        lambda: model_e.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model_e.apply(v, images, sizes))(var_e)
    assert dets.boxes.shape == (1, 4, 4)
    assert masks.shape[2] == masks.shape[3]


def test_crop_and_resize_masks_matches_gather_reference():
    """The matmul-form mask-target crop (interpolation-matrix einsums,
    the TPU-fast path) must reproduce the naive gather-based bilinear
    sample exactly, including zero padding outside the canvas and
    degenerate gt boxes."""
    from afigan_tpu.models.mask_head import crop_and_resize_masks

    def reference_crop(gt_masks, gt_boxes, rois, roi_gt_idx, out_size):
        mh, mw = gt_masks.shape[1], gt_masks.shape[2]
        g = gt_boxes[roi_gt_idx]
        gw = np.maximum(g[:, 2] - g[:, 0], 1e-4)
        gh = np.maximum(g[:, 3] - g[:, 1], 1e-4)
        x1 = (rois[:, 0] - g[:, 0]) / gw * mw
        x2 = (rois[:, 2] - g[:, 0]) / gw * mw
        y1 = (rois[:, 1] - g[:, 1]) / gh * mh
        y2 = (rois[:, 3] - g[:, 1]) / gh * mh
        p = (np.arange(out_size, dtype=np.float32) + 0.5) / out_size
        ys = y1[:, None] + p[None, :] * (y2 - y1)[:, None] - 0.5
        xs = x1[:, None] + p[None, :] * (x2 - x1)[:, None] - 0.5
        out = np.zeros((rois.shape[0], out_size, out_size), np.float32)
        for r in range(rois.shape[0]):
            mask = gt_masks[roi_gt_idx[r]]
            for i in range(out_size):
                for j in range(out_size):
                    yy, xx = ys[r, i], xs[r, j]
                    y0, x0 = int(np.floor(yy)), int(np.floor(xx))
                    ly, lx = yy - y0, xx - x0
                    acc = 0.0
                    for dy, wy in ((0, 1 - ly), (1, ly)):
                        for dx, wx in ((0, 1 - lx), (1, lx)):
                            iy, ix = y0 + dy, x0 + dx
                            if 0 <= iy < mh and 0 <= ix < mw:
                                acc += wy * wx * mask[iy, ix]
                    out[r, i, j] = acc
        return out

    rng = np.random.RandomState(0)
    m, mh, mw, r, s = 5, 12, 9, 16, 7
    gt_masks = rng.rand(m, mh, mw).astype(np.float32)
    gt_boxes = np.zeros((m, 4), np.float32)
    gt_boxes[:, :2] = rng.rand(m, 2) * 50
    gt_boxes[:, 2:] = gt_boxes[:, :2] + rng.rand(m, 2) * 60 + 1
    gt_boxes[-1] = [10, 10, 10, 10]  # degenerate
    rois = np.zeros((r, 4), np.float32)
    rois[:, :2] = rng.rand(r, 2) * 80 - 10  # some fully/partly off-canvas
    rois[:, 2:] = rois[:, :2] + rng.rand(r, 2) * 70 + 0.5
    idx = rng.randint(0, m, size=r).astype(np.int32)

    got = np.asarray(
        crop_and_resize_masks(
            jnp.asarray(gt_masks), jnp.asarray(gt_boxes), jnp.asarray(rois),
            jnp.asarray(idx), s,
        )
    )
    want = reference_crop(gt_masks, gt_boxes, rois, idx, s)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

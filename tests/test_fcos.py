"""FCOS head tests: target assignment semantics, losses, inference shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.models import build_model
from afigan_tpu.models.fcos import (
    compute_locations,
    fcos_targets_single,
    _giou_loss,
)
from afigan_tpu.models.roi_heads import GroundTruth


def test_locations_grid():
    locs = compute_locations([(4, 4)], [8])[0]
    assert locs.shape == (16, 4 // 4 * 2) or locs.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(locs[0]), [4, 4])
    np.testing.assert_allclose(np.asarray(locs[5]), [12, 12])


def test_target_assignment_center_and_level():
    # two levels: stride 8 (range [-1,64]) and 16 ([64, inf])
    locs_l = compute_locations([(8, 8), (4, 4)], [8, 16])
    locations = jnp.concatenate(locs_l)
    ranges = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray([-1.0, 64.0]), (64, 2)),
        jnp.broadcast_to(jnp.asarray([64.0, 1e8]), (16, 2)),
    ])
    strides = jnp.concatenate([jnp.full((64,), 8.0), jnp.full((16,), 16.0)])

    gt = GroundTruth(
        boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 0.0, 0.0]]),
        classes=jnp.asarray([2, 0], jnp.int32),
        valid=jnp.asarray([True, False]),
    )
    labels, reg_t, matched = fcos_targets_single(
        locations, ranges, strides, gt, center_sample=True, pos_radius=1.5
    )
    labels = np.asarray(labels)
    # small box (side 32 → max dist < 64) assigns only on level 0
    assert (labels[64:] == -1).all()
    pos = np.nonzero(labels[:64] >= 0)[0]
    assert len(pos) > 0
    assert (labels[pos] == 2).all()
    # reg targets at a positive location are the l,t,r,b distances
    i = pos[0]
    x, y = np.asarray(locations[i])
    np.testing.assert_allclose(
        np.asarray(reg_t[i]), [x - 8, y - 8, 40 - x, 40 - y], atol=1e-5
    )


def test_giou_perfect_is_zero():
    t = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
    np.testing.assert_allclose(np.asarray(_giou_loss(t, t)), [0.0], atol=1e-6)


def _fcos_cfg():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/inference/AFI-GAN_fcos_R_50_FPN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 16
    return cfg


def test_fcos_train_and_inference_forward():
    cfg = _fcos_cfg()
    model = build_model(cfg, train=True)
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255
    )
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    gt = GroundTruth(
        boxes=jnp.asarray([[[8.0, 8.0, 48.0, 40.0], [0, 0, 0, 0]]]),
        classes=jnp.asarray([[1, 0]], jnp.int32),
        valid=jnp.asarray([[True, False]]),
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, gt)
    )()
    losses = jax.jit(lambda v: model.apply(v, images, sizes, gt))(variables)
    assert set(losses) == {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    model_e = build_model(cfg, train=False)
    var_e = jax.jit(
        lambda: model_e.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model_e.apply(v, images, sizes))(var_e)
    assert dets.boxes.shape == (1, 16, 4)
    assert masks is None
    # srf_module present in the FPN (AFI path)
    assert "srf_module" in var_e["params"]["backbone"]["pyramid"]

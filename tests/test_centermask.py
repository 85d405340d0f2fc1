"""CenterMask forward tests (train losses + inference masks)."""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.models import build_model
from afigan_tpu.models.roi_heads import GroundTruth


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/inference/AFI-GAN_fcos_R_50_FPN.yaml")
    cfg.MODEL.META_ARCHITECTURE = "CenterMask"
    cfg.MODEL.MASK_ON = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.MODEL.FCOS.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.FCOS.POST_NMS_TOPK_TEST = 8
    cfg.TPU.MAX_GT_BOXES = 4
    return cfg


def test_centermask_train_and_inference():
    cfg = _cfg()
    model = build_model(cfg, train=True)
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255
    )
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    gt = GroundTruth(
        boxes=jnp.asarray([[[8.0, 8.0, 48.0, 40.0], [0, 0, 0, 0],
                            [0, 0, 0, 0], [0, 0, 0, 0]]]),
        classes=jnp.asarray([[1, 0, 0, 0]], jnp.int32),
        valid=jnp.asarray([[True, False, False, False]]),
        masks=jnp.asarray(
            np.random.RandomState(1).rand(1, 4, 32, 32).astype(np.float32)
        ),
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, gt)
    )()
    losses = jax.jit(lambda v: model.apply(v, images, sizes, gt))(variables)
    assert set(losses) == {
        "loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr", "loss_mask"
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # SAG attention + mask head params exist
    assert "mask_head" in variables["params"]
    assert "sam" in variables["params"]["mask_head"]

    model_e = build_model(cfg, train=False)
    var_e = jax.jit(
        lambda: model_e.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets, masks = jax.jit(lambda v: model_e.apply(v, images, sizes))(var_e)
    assert dets.boxes.shape == (1, 8, 4)
    assert masks.shape == (1, 8, 28, 28)
    assert float(masks.min()) >= 0 and float(masks.max()) <= 1


def test_centermask_mask_branch_trains_on_fcos_proposals():
    """CenterMask2 protocol: every mask-branch training box comes from the
    FCOS head's own proposal set (its decoded post-NMS boxes) or from the
    appended GT boxes — not from jittered GT (round-2 deviation, closed)."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg()
    model = build_model(cfg, train=True)
    rng = np.random.RandomState(3)
    h = w = 64
    images = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[h, w]], jnp.int32)
    gt_boxes = np.array([[[8.0, 8.0, 40.0, 36.0], [20.0, 24.0, 60.0, 60.0]]],
                        np.float32)
    gt = GroundTruth(
        boxes=jnp.asarray(gt_boxes),
        classes=jnp.asarray([[0, 1]], jnp.int32),
        valid=jnp.asarray([[True, True]]),
        masks=jnp.asarray(rng.rand(1, 2, 28, 28).astype(np.float32) > 0.5,
                          jnp.float32),
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, gt)
    )()
    losses, inter = model.apply(
        variables, images, sizes, gt, rngs={"sampling": jax.random.PRNGKey(1)},
        mutable=["intermediates"],
    )
    assert np.isfinite(float(losses["loss_mask"]))
    train_boxes = np.asarray(inter["intermediates"]["mask_train_boxes"][0])[0]
    proposals = np.asarray(inter["intermediates"]["fcos_proposals"][0])[0]
    pool = np.concatenate([proposals, gt_boxes[0]], axis=0)
    for tb in train_boxes:
        dists = np.abs(pool - tb[None]).max(axis=1)
        assert dists.min() < 1e-4, (
            f"mask-branch box {tb} not in FCOS-proposal/GT pool"
        )

    # different sampling keys select different fg subsets (random subsample)
    _, inter2 = model.apply(
        variables, images, sizes, gt, rngs={"sampling": jax.random.PRNGKey(7)},
        mutable=["intermediates"],
    )
    tb2 = np.asarray(inter2["intermediates"]["mask_train_boxes"][0])[0]
    # both runs draw from the same pool; the no-rng path must also run
    l0 = model.apply(variables, images, sizes, gt)
    assert np.isfinite(float(l0["loss_mask"]))
    assert tb2.shape == train_boxes.shape


def test_centermask_honors_pooler_impl_knob():
    """TPU.POOLER_IMPL must reach CenterMask's mask pooler (the same
    A/B + debugging fallback the R-CNN heads honor): gather vs pallas
    inference masks must agree on identical params."""
    cfg = _cfg()
    images = jnp.asarray(
        np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32) * 255
    )
    sizes = jnp.asarray([[64, 64]], jnp.int32)

    cfg.TPU.POOLER_IMPL = "pallas"
    m_pallas = build_model(cfg, train=False)
    var = jax.jit(
        lambda: m_pallas.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    dets_p, masks_p = jax.jit(lambda v: m_pallas.apply(v, images, sizes))(var)

    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.POOLER_IMPL = "gather"
    cfg2.freeze()
    m_gather = build_model(cfg2, train=False)
    assert m_gather.pooler_impl == "gather"
    dets_g, masks_g = jax.jit(lambda v: m_gather.apply(v, images, sizes))(var)

    np.testing.assert_allclose(
        np.asarray(dets_p.boxes), np.asarray(dets_g.boxes), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(masks_p), np.asarray(masks_g), rtol=1e-4, atol=1e-4
    )

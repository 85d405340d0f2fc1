"""Stage-2 AF-extractor with FCOS R-50-BiFPN (BASELINE config #3).

The only BASELINE combination coupling the GAN stage to a BiFPN
pyramid (shared-AFI upsampling inside the repeated fusion) and FCOS
losses. Levels: BiFPN extractor + BiFPN guide both give p3-p7, so all
five couple (gan_levels); channels follow MODEL.AFI.IN_CHANNELS=160
(BIFPN.OUT_CHANNELS) in the production yaml, shrunk here for CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.stage2 import (
    gan_levels,
    init_stage2_state,
    make_stage2_train_step,
)
from afigan_tpu.models.roi_heads import GroundTruth


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/step2_af_extractor_training/"
        "step2_af_extractor_fcos_R_50_BiFPN.yaml"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BIFPN.OUT_CHANNELS = 32
    cfg.MODEL.BIFPN.FPN_REPEAT = 2
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.SOLVER.BASE_LR = 0.001
    return cfg


def test_gan_levels_fcos_bifpn_all_five():
    assert gan_levels(_cfg()) == ("p3", "p4", "p5", "p6", "p7")


def test_gan_levels_default_rcnn_unchanged():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/step2_af_extractor_training/"
        "step2_af_extractor_mask_rcnn_R_50_FPN_1x.yaml"
    )
    assert gan_levels(cfg) == ("p2", "p3", "p4", "p5", "p6")


def test_stage2_fcos_bifpn_step_runs_and_updates():
    cfg = _cfg()
    h = w = 128  # p7 = 1x1 on the half-res stream
    state, guide_vars = init_stage2_state(
        cfg, jax.random.PRNGKey(0), sample_hw=(h, w), max_gt=4
    )
    old_det = jax.device_get(state.det_params)
    old_d = jax.device_get(state.d_params)
    step = make_stage2_train_step(cfg)

    rng = np.random.RandomState(0)
    m = 4
    boxes = np.zeros((1, m, 4), np.float32)
    boxes[:, 0] = [8, 8, 60, 48]
    boxes[:, 1] = [30, 40, 100, 90]
    batch = {
        "image": jnp.asarray(rng.rand(1, 2 * h, 2 * w, 3).astype(np.float32) * 255),
        "image_x0.5": jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255),
        "image_sizes_x0.5": jnp.asarray([[h, w]], jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.zeros((1, m), jnp.int32),
            valid=jnp.asarray(np.array([[True, True, False, False]])),
            masks=None,
        ),
    }
    new_state, metrics = step(state, guide_vars, batch, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    for k in ("total_loss", "d_loss", "loss_fcos_cls", "loss_fcos_loc",
              "loss_fcos_ctr", "adv_loss_p3", "adv_loss_p7",
              "content_loss_p3", "content_loss_p7"):
        assert k in m and np.isfinite(float(m[k])), (k, m.get(k))
    # both the detector (incl. the AFI inside BiFPN) and D must move
    det_delta = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree.leaves(old_det),
                        jax.tree.leaves(jax.device_get(new_state.det_params)))
    )
    d_delta = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree.leaves(old_d),
                        jax.tree.leaves(jax.device_get(new_state.d_params)))
    )
    assert det_delta > 0 and d_delta > 0


def test_dual_scale_divisibility_bifpn_half_stream():
    """Stage-1/2 loaders feed the detector the half-res stream: for a
    BiFPN extractor the FULL canvas must be 256-divisible so the half
    stays 128-divisible (BiFPN rejects anything else at trace time)."""
    from afigan_tpu.ops.image_list import required_size_divisibility

    cfg = _cfg()
    assert required_size_divisibility(cfg) == 128
    assert required_size_divisibility(cfg, dual_scale=True) == 256
    # FPN family unchanged
    r50 = get_cfg()
    assert required_size_divisibility(r50) == 64
    assert required_size_divisibility(r50, dual_scale=True) == 64


def test_collate_dual_scale_bifpn_canvas():
    from afigan_tpu.data.loader import collate_batch
    from afigan_tpu.models.roi_heads import GroundTruth

    sample = {
        "image": np.zeros((700, 1100, 3), np.float32),
        "image_x0.5": np.zeros((350, 550, 3), np.float32),
        "image_id": 1,
        "orig_height": 700,
        "orig_width": 1100,
    }
    batch = collate_batch([sample], ((704, 1152),), size_divisibility=256,
                          dual_scale=True)
    fh, fw = batch["image"].shape[1:3]
    assert fh % 256 == 0 and fw % 256 == 0, (fh, fw)
    hh, hw = batch["image_x0.5"].shape[1:3]
    assert (hh, hw) == (fh // 2, fw // 2)
    assert hh % 128 == 0 and hw % 128 == 0

"""Training-dynamics validation: losses actually DECREASE over real
multi-step optimization for all three stages (PARITY "remaining
candidates" #4; complements the single-step update tests in
test_train_stages.py which only check finiteness + param movement).

Each test overfits a fixed small batch through the ACTUAL compiled
train step (same code path the trainers jit) and asserts the relevant
loss falls by a clear margin:

  * stage 1 — the generator's content (L1-to-guide-features) loss: the
    supervised part of the GAN objective, must shrink steadily
    (ref stage1_trainer.py's srf training loop).
  * stage 2 — the AF-extractor objective: detector losses + content;
    both components must fall (ref stage2_trainer.py).
  * stage 3 — the full Mask R-CNN loss (ref stage3 = plain d2 training).

Adversarial terms oscillate by design and are asserted only finite.

Harness realism notes (probed; see the curves in each assert message):
  * Images are dataset-mean-centered moderate-contrast noise and the
    half-res stream is a TRUE downscale of the full image — with
    independent noise at the two scales the content target is
    unfittable and its magnitude meaningless.
  * Gradient clipping (SOLVER.CLIP_GRADIENTS, the d2 stabilizer large
    configs enable) is on: at random init a 50-layer guide's feature
    magnitudes are orders beyond the pretrained regime these LRs are
    tuned for, and unclipped steps blow up within ~20 iterations.
  * LR warmup is off: these tests run O(40) steps; the d2 default
    1000-iter warmup keeps the effective LR ~1/1000th and masks real
    dynamics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.stage1 import init_stage1_state, make_stage1_train_step
from afigan_tpu.engine.stage2 import init_stage2_state, make_stage2_train_step
from afigan_tpu.engine.stage3 import init_stage3_state, make_stage3_train_step
from afigan_tpu.models.roi_heads import GroundTruth


def _mean(xs):
    return float(np.mean(xs))


def _image(rng, b, h, w):
    """Moderate-contrast images centered on the dataset pixel mean."""
    return (115.0 + 30.0 * rng.randn(b, h, w, 3)).astype(np.float32)


def _downscale(img):
    b, h, w, c = img.shape
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (b, h // 2, w // 2, c), "linear")
    )


def _small_backbone(cfg):
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.AFI.IN_CHANNELS = 32
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WARMUP_FACTOR = 1.0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    return cfg


def test_stage1_content_loss_decreases():
    cfg = _small_backbone(get_cfg())
    cfg.MODEL.GUIDE_BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.SOLVER.BASE_LR = 0.01
    rng = np.random.RandomState(3)
    img = _image(rng, 2, 64, 64)
    batch = {"image": jnp.asarray(img), "image_x0.5": jnp.asarray(_downscale(img))}
    state, guide_vars = init_stage1_state(cfg, jax.random.PRNGKey(0), sample_hw=(32, 32))
    step = make_stage1_train_step(cfg)
    content, adv = [], []
    for _ in range(40):
        state, metrics = step(state, guide_vars, batch)
        m = jax.device_get(metrics)
        content.append(sum(float(v) for k, v in m.items() if k.startswith("content_loss")))
        adv.append(float(m["g_loss"]))
    assert all(np.isfinite(adv))
    start, end = _mean(content[:5]), _mean(content[-5:])
    assert end < 0.95 * start, (
        f"stage-1 content loss did not train down: {start:.4f} -> {end:.4f}\n"
        f"curve: {np.round(content, 4).tolist()}"
    )


def _det_cfg():
    cfg = _small_backbone(get_cfg())
    cfg.merge_from_file("/root/repo/configs/Base-RCNN-FPN-AFIGAN.yaml")
    cfg = _small_backbone(cfg)
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    return cfg


def _det_batch(b, h, w, seed=0):
    rng = np.random.RandomState(seed)
    m = 4
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [h * 0.1, h * 0.1, w * 0.6, h * 0.5]
    boxes[:, 1] = [w * 0.3, h * 0.4, w * 0.9, h * 0.9]
    masks = np.zeros((b, m, 28, 28), np.float32)
    masks[:, :, 6:22, 6:22] = 1.0  # a learnable blob, not noise
    return {
        "image": jnp.asarray(_image(rng, b, h, w)),
        "image_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(np.tile([0, 1, 0, 0], (b, 1)).astype(np.int32)),
            valid=jnp.asarray(np.tile([True, True, False, False], (b, 1))),
            masks=jnp.asarray(masks),
        ),
    }


def test_stage3_detector_loss_decreases():
    cfg = _det_cfg()
    cfg.MODEL.AFI_FREEZE = False
    cfg.SOLVER.BASE_LR = 0.005
    batch = _det_batch(1, 64, 64, seed=11)
    state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4)
    step = make_stage3_train_step(cfg)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    start, end = _mean(losses[:5]), _mean(losses[-5:])
    assert np.all(np.isfinite(losses))
    assert end < 0.5 * start, (
        f"stage-3 total loss did not train down: {start:.4f} -> {end:.4f}\n"
        f"curve: {np.round(losses, 4).tolist()}"
    )


def test_stage2_extractor_losses_decrease():
    cfg = _det_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    h, w = 128, 128
    hh, hw = h // 2, w // 2
    batch = _det_batch(1, hh, hw, seed=5)
    full = _image(np.random.RandomState(6), 1, h, w)
    half = _downscale(full)
    batch["image"] = jnp.asarray(half)
    data = {
        "image": jnp.asarray(full),
        "image_x0.5": batch["image"],
        "image_sizes_x0.5": batch["image_sizes"],
        "gt": batch["gt"],
    }
    state, guide_vars = init_stage2_state(
        cfg, jax.random.PRNGKey(0), sample_hw=(hh, hw), max_gt=4
    )
    step = make_stage2_train_step(cfg)
    key = jax.random.PRNGKey(1)
    total, content = [], []
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, guide_vars, data, sub)
        m = jax.device_get(metrics)
        total.append(float(m["total_loss"]))
        content.append(sum(float(v) for k, v in m.items() if k.startswith("content_loss")))
    assert np.all(np.isfinite(total))
    assert _mean(total[-5:]) < 0.6 * _mean(total[:5]), (
        f"stage-2 total loss did not train down: "
        f"{_mean(total[:5]):.4f} -> {_mean(total[-5:]):.4f}\n"
        f"curve: {np.round(total, 4).tolist()}"
    )
    assert _mean(content[-5:]) < 0.65 * _mean(content[:5]), (
        f"stage-2 content loss did not train down: "
        f"{_mean(content[:5]):.4f} -> {_mean(content[-5:]):.4f}"
    )

"""Stage 1/2/3 train-step tests: loss math, param updates, multi-device DP.

Multi-device tests run on the virtual 8-CPU mesh (conftest), checking the
TPU-native data-parallel substrate: shard_map + psum grads must produce
the same params as single-device training on the concatenated batch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.stage1 import init_stage1_state, make_stage1_train_step
from afigan_tpu.engine.stage3 import init_stage3_state, make_stage3_train_step
from afigan_tpu.models.roi_heads import GroundTruth
from afigan_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _stage1_cfg():
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.AFI.IN_CHANNELS = 16
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.GUIDE_BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.SOLVER.BASE_LR = 0.01
    return cfg


def _stage1_batch(b=1, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_x0.5": jnp.asarray(
            rng.rand(b, h // 2, w // 2, 3).astype(np.float32) * 255
        ),
    }


def test_stage1_step_updates_both_models():
    cfg = _stage1_cfg()
    state, guide_vars = init_stage1_state(cfg, jax.random.PRNGKey(0), sample_hw=(16, 16))
    step = make_stage1_train_step(cfg)
    batch = _stage1_batch()
    # the step donates its input state → snapshot params before stepping
    old_g = jax.device_get(state.g_params)
    old_d = jax.device_get(state.d_params)
    new_state, metrics = step(state, guide_vars, batch)
    state = state._replace(g_params=old_g, d_params=old_d)

    assert int(new_state.step) == 1
    for k in ["d_loss", "g_loss", "content_loss_p2", "adv_loss_p6"]:
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # both G and D must move
    g_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.g_params, new_state.g_params),
    )
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.d_params, new_state.d_params),
    )
    assert g_delta > 0 and d_delta > 0
    # adversarial gradient must reach G (quirk Q3 fixed): with adv weight
    # dominated by content loss, just check finite + nonzero metrics
    assert float(metrics["adv_loss_p2"]) > 0


def test_stage1_multidevice_matches_singledevice():
    cfg = _stage1_cfg()
    n = 4
    mesh = make_mesh(("data",), (n,), jax.devices()[:n])
    state, guide_vars = init_stage1_state(cfg, jax.random.PRNGKey(0), sample_hw=(16, 16))

    batch = _stage1_batch(b=n, seed=1)

    # single-device full batch
    step1 = make_stage1_train_step(cfg)
    s1, m1 = step1(jax.tree.map(jnp.copy, state), guide_vars, batch)

    # sharded
    stepN = make_stage1_train_step(cfg, mesh=mesh)
    sN, mN = stepN(
        replicate(mesh, jax.tree.map(jnp.copy, state)),
        replicate(mesh, guide_vars),
        shard_batch(mesh, batch),
    )

    # loss metrics agree (pmean of per-shard means == full-batch mean here
    # because shards are equal-sized)
    np.testing.assert_allclose(
        float(m1["content_loss_p2"]), float(mN["content_loss_p2"]), rtol=2e-3
    )
    # G params after one step agree (psum-mean grads == full-batch grads),
    # modulo BatchNorm batch-stat differences in D's loss — G's content
    # term dominates; allow small tolerance.
    a = jax.tree.leaves(s1.g_params)[0]
    b = jax.tree.leaves(sN.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def _stage3_cfg():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/Base-RCNN-FPN-AFIGAN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.AFI.IN_CHANNELS = 64
    cfg.MODEL.AFI.N_RDB = 1
    cfg.MODEL.AFI.GROWTH_RATE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.SOLVER.BASE_LR = 0.001
    return cfg


def _det_batch(b=1, h=64, w=64, m=4, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [8, 8, 40, 32]
    boxes[:, 1] = [20, 24, 60, 56]
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.zeros((b, m), jnp.int32),
            valid=jnp.asarray(np.array([[True, True, False, False]] * b)),
            masks=jnp.asarray(rng.rand(b, m, 28, 28).astype(np.float32)),
        ),
    }


def test_stage3_step_and_afi_freeze():
    cfg = _stage3_cfg()
    cfg.MODEL.AFI_FREEZE = True
    state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4)
    step = make_stage3_train_step(cfg)
    batch = _det_batch()
    old_params = jax.device_get(state.params)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    state = state._replace(params=old_params)
    assert np.isfinite(float(metrics["total_loss"]))

    # srf_module params must be FROZEN (ref fpn_sr.py:67-69)
    old_srf = state.params["backbone"]["pyramid"]["srf_module"]
    new_srf = new_state.params["backbone"]["pyramid"]["srf_module"]
    for a, b in zip(jax.tree.leaves(old_srf), jax.tree.leaves(new_srf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # frozen backbone stages (FREEZE_AT=2): stem + res2 unchanged
    old_res2 = state.params["backbone"]["bottom_up"]["res2/block0"]
    new_res2 = new_state.params["backbone"]["bottom_up"]["res2/block0"]
    for a, b in zip(jax.tree.leaves(old_res2), jax.tree.leaves(new_res2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # but the heads must move
    a = state.params["roi_heads"]["box_head"]["fc1"]["kernel"]
    b = new_state.params["roi_heads"]["box_head"]["fc1"]["kernel"]
    assert float(jnp.abs(a - b).max()) > 0


def test_stage3_multidevice_runs():
    cfg = _stage3_cfg()
    n = 2
    mesh = make_mesh(("data",), (n,), jax.devices()[:n])
    state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4)
    step = make_stage3_train_step(cfg, mesh=mesh)
    batch = _det_batch(b=n)
    new_state, metrics = step(
        replicate(mesh, state), shard_batch(mesh, batch), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1


def test_stage1_adversarial_gradient_reaches_generator():
    """Quirk-Q3 regression guard (VERDICT round-1 weak #6): the G step's
    adversarial term must carry REAL gradient to G. If a detach were
    reintroduced (ref stage1_trainer.py:399-408 feeds D(tr).detach() into
    the BCE), changing ADV_LOSS_WEIGHT could not change the G update —
    so two steps identical except for adv_w must produce different G
    params through the ACTUAL compiled step."""
    batch = _stage1_batch(seed=7)

    results = []
    for adv_w in (0.0, 100.0):
        cfg = _stage1_cfg()
        cfg.MODEL.AFI.ADV_LOSS_WEIGHT = adv_w
        state, guide_vars = init_stage1_state(
            cfg, jax.random.PRNGKey(0), sample_hw=(16, 16)
        )
        step = make_stage1_train_step(cfg)
        new_state, metrics = step(state, guide_vars, batch)
        results.append(jax.device_get(new_state.g_params))
        assert np.isfinite(float(metrics["g_loss"]))

    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1]))
    ]
    assert max(diffs) > 1e-8, (
        "adversarial weight had no effect on the G update — the adv term "
        "is detached from the generator (quirk Q3 reintroduced)"
    )


def test_stage3_remat_is_numerically_identical():
    """TPU.REMAT (backbone bottlenecks + AFI blocks + whole pyramid
    rematerialized) is a pure memory/compute trade: one train step must
    produce the SAME loss as the un-rematted program."""
    losses = {}
    for remat in (False, True):
        cfg = _stage3_cfg()
        cfg.MODEL.AFI_FREEZE = False
        cfg.TPU.REMAT = remat
        state = init_stage3_state(
            cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4
        )
        step = make_stage3_train_step(cfg)
        _, metrics = step(state, _det_batch(), jax.random.PRNGKey(1))
        losses[remat] = float(metrics["total_loss"])
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 1e-3, losses


def test_stage3_selective_remat_is_numerically_identical():
    """TPU.REMAT_MODE="selective" (res2 + pyramid + AFI only) must also
    be a pure memory/compute trade: same one-step loss as no remat."""
    losses = {}
    for mode in (None, "selective"):
        cfg = _stage3_cfg()
        cfg.MODEL.AFI_FREEZE = False
        if mode:
            cfg.TPU.REMAT = True
            cfg.TPU.REMAT_MODE = mode
        state = init_stage3_state(
            cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4
        )
        step = make_stage3_train_step(cfg)
        _, metrics = step(state, _det_batch(), jax.random.PRNGKey(1))
        losses[mode] = float(metrics["total_loss"])
    assert np.isfinite(losses["selective"])
    assert abs(losses["selective"] - losses[None]) < 1e-3, losses


def test_stage3_grad_accum_matches_mean_of_microbatch_steps():
    """TPU.GRAD_ACCUM=k scans k microbatches and AVERAGES their grads —
    k-way DP semantics (the same per-shard mean the shard_map path
    psum-averages). On a fresh optimizer the first SGD update is linear
    in the grad (momentum trace starts at g; weight decay adds a
    grad-independent term), so the accum step's param delta must equal
    the MEAN of the k accum=1 steps' deltas, each run from the same
    initial state on its contiguous microbatch slice with the matching
    jax.random.split(rng, k)[i] key."""
    cfg = _stage3_cfg()
    cfg.MODEL.AFI_FREEZE = False
    state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64), max_gt=4)
    snap = jax.device_get(state)  # steps donate their input state
    fresh = lambda: jax.tree.map(jnp.asarray, snap)
    batch = _det_batch(b=4, seed=3)
    rng = jax.random.PRNGKey(1)

    cfg.TPU.GRAD_ACCUM = 2
    accum_state, metrics = make_stage3_train_step(cfg)(fresh(), batch, rng)
    assert np.isfinite(float(metrics["total_loss"]))

    cfg.TPU.GRAD_ACCUM = 1
    step1 = make_stage3_train_step(cfg)
    rngs = jax.random.split(rng, 2)
    deltas = []
    for i in range(2):
        mb = jax.tree.map(lambda x: x[2 * i:2 * i + 2], batch)
        si, _ = step1(fresh(), mb, rngs[i])
        deltas.append(
            jax.tree.map(lambda n, o: np.asarray(n) - np.asarray(o),
                         jax.device_get(si.params), snap.params)
        )

    expected = jax.tree.map(lambda a, b: (a + b) / 2, *deltas)
    got = jax.tree.map(lambda n, o: np.asarray(n) - np.asarray(o),
                       jax.device_get(accum_state.params), snap.params)
    for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(g, e, rtol=1e-4, atol=1e-6)


def test_stage2_multidevice_discriminator_bn_syncs():
    """Stage-2's discriminator must SyncBN across shards like stage 1:
    one multi-device step on per-shard-different data must produce the
    same D batch stats and D params as the single-device step on the
    full batch (D's inputs are sampling-independent pyramid features, so
    these quantities are exactly comparable)."""
    from afigan_tpu.engine.stage2 import init_stage2_state, make_stage2_train_step

    cfg = _stage3_cfg()
    n = 4
    h = w = 64          # full-res (guide) canvas
    hh, hw = h // 2, w // 2
    mesh = make_mesh(("data",), (n,), jax.devices()[:n])

    rng = np.random.RandomState(3)
    boxes = np.zeros((n, 4, 4), np.float32)
    boxes[:, 0] = [4, 4, 20, 16]
    boxes[:, 1] = [10, 12, 30, 28]
    data = {
        "image": jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32) * 255),
        "image_x0.5": jnp.asarray(
            rng.rand(n, hh, hw, 3).astype(np.float32) * 255
        ),
        "image_sizes_x0.5": jnp.asarray([[hh, hw]] * n, jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.zeros((n, 4), jnp.int32),
            valid=jnp.asarray(np.tile([True, True, False, False], (n, 1))),
            masks=jnp.asarray(rng.rand(n, 4, 28, 28).astype(np.float32)),
        ),
    }

    state, guide_vars = init_stage2_state(
        cfg, jax.random.PRNGKey(0), sample_hw=(hh, hw), max_gt=4
    )
    key = jax.random.PRNGKey(7)

    step1 = make_stage2_train_step(cfg)
    s1, _ = step1(jax.tree.map(jnp.copy, state), guide_vars, data, key)

    stepN = make_stage2_train_step(cfg, mesh=mesh)
    sN, _ = stepN(
        replicate(mesh, jax.tree.map(jnp.copy, state)),
        replicate(mesh, guide_vars),
        shard_batch(mesh, data),
        replicate(mesh, key),
    )

    for a, b in zip(jax.tree.leaves(s1.d_stats), jax.tree.leaves(sN.d_stats)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
    for a, b in zip(jax.tree.leaves(s1.d_params), jax.tree.leaves(sN.d_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )

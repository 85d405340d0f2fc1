"""Solver tests: warmup-multistep LR numerics + freeze-mask behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.solver import (
    afi_freeze_predicate,
    backbone_freeze_predicate,
    build_optimizer,
    frozen_bn_predicate,
    make_trainable_mask,
    warmup_multistep_schedule,
)


def test_warmup_multistep_schedule_d2_numerics():
    sched = warmup_multistep_schedule(
        base_lr=0.02, steps=(60000, 80000), gamma=0.1,
        warmup_factor=1.0 / 1000, warmup_iters=1000,
    )
    # iter 0: factor = warmup_factor
    np.testing.assert_allclose(float(sched(0)), 0.02 * 1e-3, rtol=1e-5)
    # mid-warmup: linear ramp
    np.testing.assert_allclose(
        float(sched(500)), 0.02 * (1e-3 * 0.5 + 0.5), rtol=1e-5
    )
    # plateau
    np.testing.assert_allclose(float(sched(30000)), 0.02, rtol=1e-6)
    # after first step: x0.1; after second: x0.01
    np.testing.assert_allclose(float(sched(70000)), 0.002, rtol=1e-6)
    np.testing.assert_allclose(float(sched(85000)), 0.0002, rtol=1e-6)


def test_freeze_predicates():
    assert backbone_freeze_predicate(2)("backbone/bottom_up/stem/conv1/conv/kernel")
    assert backbone_freeze_predicate(2)("backbone/bottom_up/res2/block0/conv1/conv/kernel")
    assert not backbone_freeze_predicate(2)("backbone/bottom_up/res3/block0/conv1/conv/kernel")
    assert not backbone_freeze_predicate(0)("backbone/bottom_up/stem/conv1/conv/kernel")
    assert afi_freeze_predicate("backbone/pyramid/srf_module/generators_0/head/conv/kernel")
    assert not afi_freeze_predicate("backbone/pyramid/fpn_lateral2/conv/kernel")


def test_masked_optimizer_freezes_params():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    params = {
        "backbone": {
            "pyramid": {
                "srf_module": {"w": jnp.ones((3,))},
                "fpn_lateral2": {"w": jnp.ones((3,))},
            }
        }
    }
    tx, _ = build_optimizer(cfg, params, [afi_freeze_predicate])
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    new = optax.apply_updates(params, updates)
    # srf frozen, lateral moved
    np.testing.assert_array_equal(
        np.asarray(new["backbone"]["pyramid"]["srf_module"]["w"]), np.ones(3)
    )
    assert float(
        jnp.abs(new["backbone"]["pyramid"]["fpn_lateral2"]["w"] - 1.0).max()
    ) > 0


def test_adamw_option():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "AdamW"
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros((2,))}}
    tx, _ = build_optimizer(cfg, params)
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    assert np.isfinite(np.asarray(jax.tree.leaves(updates)[0])).all()

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


def test_frozen_bn_affine_params_never_train():
    """FrozenBatchNorm scale/bias are d2 buffers: the optimizer must
    freeze ALL FOUR leaves of a params subtree that carries a 'mean'
    leaf, even though the module is just named 'norm' (path predicates
    can't see the type)."""
    cfg = get_cfg()
    params = {
        "backbone": {
            "res3/block0": {
                "conv1": {
                    "conv": {"kernel": jnp.ones((1, 1, 2, 2))},
                    "norm": {  # FrozenBN: stats in params
                        "scale": jnp.ones(2), "bias": jnp.zeros(2),
                        "mean": jnp.zeros(2), "var": jnp.ones(2),
                    },
                },
            },
        },
        "head": {
            "norm": {"scale": jnp.ones(2), "bias": jnp.zeros(2)},  # live GN/BN
            "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
        },
    }
    tx, _ = build_optimizer(cfg, params)
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    fbn = updates["backbone"]["res3/block0"]["conv1"]["norm"]
    for leaf in ("scale", "bias", "mean", "var"):
        np.testing.assert_array_equal(np.asarray(fbn[leaf]), 0.0)
    # live norm params still train
    assert float(jnp.abs(updates["head"]["norm"]["scale"]).max()) > 0
    assert float(jnp.abs(updates["head"]["dense"]["kernel"]).max()) > 0


def test_norm_bias_gets_weight_decay_norm_not_bias():
    """d2 classifies norm-module params BEFORE the bias-name check: a
    norm bias gets WEIGHT_DECAY_NORM (default 0), never
    WEIGHT_DECAY_BIAS, and never the BIAS_LR_FACTOR group."""
    cfg = get_cfg()
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.5
    cfg.SOLVER.WEIGHT_DECAY_NORM = 0.0
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.BIAS_LR_FACTOR = 2.0
    params = {
        "norm": {"scale": jnp.ones(2), "bias": jnp.full((2,), 3.0)},
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.full((2,), 3.0)},
    }
    tx, _ = build_optimizer(cfg, params)
    opt = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)  # isolate decay term
    updates, _ = tx.update(grads, opt, params)
    # norm bias: no decay, no bias-LR scaling -> zero update
    np.testing.assert_allclose(np.asarray(updates["norm"]["bias"]), 0.0)
    # plain bias: decay 0.5 * 3.0 = 1.5, then BIAS_LR_FACTOR 2 and lr -1
    np.testing.assert_allclose(
        np.asarray(updates["dense"]["bias"]), -0.5 * 3.0 * 2.0, rtol=1e-6
    )

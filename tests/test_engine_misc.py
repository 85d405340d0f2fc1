"""Engine plumbing tests: events, train loop hooks, NaN guard, PreciseBN."""

import json
import os

import numpy as np
import pytest

from afigan_tpu.engine.events import CommonMetricPrinter, EventStorage, JSONWriter
from afigan_tpu.engine.precise_bn import compute_precise_bn_stats
from afigan_tpu.engine.train_loop import (
    EvalHook,
    IterationTimer,
    PeriodicCheckpointer,
    PeriodicWriter,
    TrainLoop,
)


def test_event_storage_median_and_latest():
    s = EventStorage()
    for v in [1.0, 5.0, 3.0]:
        s.put_scalar("loss", v)
    assert s.latest()["loss"] == 3.0
    assert s.median("loss") == 3.0


def test_train_loop_runs_hooks_and_writes(tmp_path):
    writer = JSONWriter(str(tmp_path / "metrics.json"))
    saves = []
    loop = TrainLoop(
        max_iter=5,
        hooks=[
            IterationTimer(),
            PeriodicWriter([writer], period=2),
            PeriodicCheckpointer(lambda it: saves.append(it), period=2),
        ],
    )
    loop.run(lambda: {"total_loss": 0.5, "data_time": 0.01})
    lines = [json.loads(l) for l in open(tmp_path / "metrics.json")]
    assert lines and lines[-1]["iteration"] == 4
    assert saves == [2, 4, 5] or saves == [2, 4]


def test_nan_guard_raises():
    loop = TrainLoop(max_iter=3, hooks=[])
    with pytest.raises(FloatingPointError):
        loop.run(lambda: {"total_loss": float("nan")})


def test_eval_hook_records_results():
    loop = TrainLoop(
        max_iter=2,
        hooks=[EvalHook(lambda: {"bbox": {"AP": 12.3}}, period=2)],
    )
    loop.run(lambda: {"total_loss": 1.0})
    assert loop.storage.latest()["bbox/AP"] == 12.3


def test_precise_bn_recovers_true_average():
    """EMA differencing must recover the uniform batch-stat average —
    with the momentum CALIBRATED from the first batch (no name
    heuristics)."""
    import jax.numpy as jnp

    m = 0.9
    batch_stats = [jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0]),
                   jnp.asarray([5.0, 6.0])]
    state = {"r": jnp.full((2,), 7.0)}  # stale running stats

    def forward(stats, batch):
        return {"r": m * stats["r"] + (1 - m) * batch}

    out = compute_precise_bn_stats(forward, state, iter(batch_stats), 3)
    np.testing.assert_allclose(np.asarray(out["r"]), [3.0, 4.0], rtol=1e-5)


def test_precise_bn_calibrates_mixed_momentum():
    """Leaves running at different momenta (backbone 0.9 vs BiFPN 0.99)
    must BOTH be recovered exactly — the old path-name heuristic
    corrupted stats ~10x when the name didn't match the momentum."""
    import jax.numpy as jnp

    batches = [jnp.asarray([10.0, 20.0]), jnp.asarray([30.0, 40.0])]
    state = {"backbone": {"r": jnp.full((2,), 3.0)},
             "weird_name": {"r": jnp.full((2,), 5.0)}}  # runs at 0.99

    def forward(stats, batch):
        return {
            "backbone": {"r": 0.9 * stats["backbone"]["r"] + 0.1 * batch},
            "weird_name": {"r": 0.99 * stats["weird_name"]["r"] + 0.01 * batch},
        }

    out = compute_precise_bn_stats(forward, state, iter(batches), 2)
    np.testing.assert_allclose(np.asarray(out["backbone"]["r"]),
                               [20.0, 30.0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weird_name"]["r"]),
                               [20.0, 30.0], rtol=1e-4)

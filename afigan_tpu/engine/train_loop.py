"""Host training loop + hooks (SURVEY §2.2 Hooks / §5.1 / §5.3).

The d2 TrainerBase/hooks system redesigned for the TPU execution model:
the device step is ONE compiled program; the host loop's job is feeding
batches (already prefetched), pulling a small metric pytree every period,
and running hooks (timing, checkpointing, writers, eval, NaN guard).

Failure detection (SURVEY §5.3): `_detect_anomaly` raises
FloatingPointError on non-finite total loss with the metric dict, exactly
the reference's only failure detector (ref stage1_trainer.py:445-451);
recovery = restart with --resume from the latest checkpoint.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np

from .events import CommonMetricPrinter, EventStorage, JSONWriter, TensorboardWriter
from ..parallel.mesh import cross_process_max


class Hook:
    def before_train(self, loop): ...
    def after_step(self, loop): ...
    def after_train(self, loop): ...


class IterationTimer(Hook):
    def before_train(self, loop):
        self._start = time.perf_counter()

    def after_step(self, loop):
        now = time.perf_counter()
        loop.storage.put_scalar("iter_time", now - self._start)
        self._start = now


class PeriodicWriter(Hook):
    def __init__(self, writers, period: int = 20):
        self.writers = writers
        self.period = period

    def after_step(self, loop):
        if (loop.storage.iter + 1) % self.period == 0 or (
            loop.storage.iter == loop.max_iter - 1
        ):
            for w in self.writers:
                w.write(loop.storage)

    def after_train(self, loop):
        for w in self.writers:
            if hasattr(w, "close"):
                w.close()


class PeriodicCheckpointer(Hook):
    def __init__(self, save_fn: Callable[[int], None], period: int):
        self.save_fn = save_fn
        self.period = period

    def after_step(self, loop):
        it = loop.storage.iter + 1
        if self.period > 0 and (it % self.period == 0 or it == loop.max_iter):
            self.save_fn(it)


class EvalHook(Hook):
    def __init__(self, eval_fn: Callable[..., Dict], period: int):
        self.eval_fn = eval_fn
        self.period = period
        # zero-arg callables stay supported; trainers' evaluate(final=...)
        # gets told whether this is the last eval (only the final one may
        # raise on TEST.EXPECTED_RESULTS mismatch)
        import inspect

        try:
            self._takes_final = "final" in inspect.signature(eval_fn).parameters
        except (TypeError, ValueError):
            self._takes_final = False

    def after_step(self, loop):
        it = loop.storage.iter + 1
        if self.period > 0 and (it % self.period == 0 or it == loop.max_iter):
            if self._takes_final:
                results = self.eval_fn(final=it == loop.max_iter)
            else:
                results = self.eval_fn()
            for task, metrics in (results or {}).items():
                for k, v in metrics.items():
                    loop.storage.put_scalar(f"{task}/{k}", v)


class LRLogger(Hook):
    def __init__(self, schedule):
        self.schedule = schedule

    def after_step(self, loop):
        loop.storage.put_scalar("lr", float(self.schedule(loop.storage.iter)))


class TrainLoop:
    """Drives step_fn over the loader with hooks; the d2 TrainerBase shape."""

    def __init__(self, max_iter: int, hooks: Optional[List[Hook]] = None,
                 start_iter: int = 0):
        self.max_iter = max_iter
        self.hooks = hooks or []
        self.storage = EventStorage(start_iter)

    def run(self, run_step: Callable[[], Dict]) -> None:
        for h in self.hooks:
            h.before_train(self)
        try:
            while self.storage.iter < self.max_iter:
                t0 = time.perf_counter()
                metrics = run_step()
                # d2 semantics: the SLOWEST worker's loader stalls every
                # replica's step, so data_time reports the process max.
                self.storage.put_scalar(
                    "data_time",
                    cross_process_max(metrics.pop("data_time", 0.0)),
                )
                self._detect_anomaly(metrics)
                for k, v in metrics.items():
                    self.storage.put_scalar(k, v)
                for h in self.hooks:
                    h.after_step(self)
                self.storage.step()
        finally:
            for h in self.hooks:
                h.after_train(self)

    def _detect_anomaly(self, metrics: Dict) -> None:
        total = metrics.get("total_loss", metrics.get("g_loss"))
        if total is not None and not np.isfinite(float(total)):
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={self.storage.iter}!\n"
                f"metrics = { {k: float(v) for k, v in metrics.items()} }"
            )


def default_writers(output_dir: str, max_iter: int):
    return [
        CommonMetricPrinter(max_iter),
        JSONWriter(f"{output_dir}/metrics.json"),
        TensorboardWriter(output_dir),
    ]

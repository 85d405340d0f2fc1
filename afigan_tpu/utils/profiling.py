"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability is per-iteration wall clock + explicit
data-loading timers (ref stage1_trainer.py:310-315, hooks.IterationTimer).
The TPU equivalents here:
  * ``ProfilerHook`` — captures a jax.profiler trace (TensorBoard-viewable)
    for a configurable iteration window;
  * ``step_timer`` — host-side wall-clock context;
  * ``annotate`` — TraceAnnotation for named regions inside host code.

data_time keeps the reference's max-across-hosts semantics via the
train loop's metric plumbing (events.py).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


class ProfilerHook:
    """Train-loop hook: trace iterations [start, start+num) to logdir."""

    def __init__(self, logdir: str, start_iter: int = 10, num_iters: int = 3):
        self.logdir = logdir
        self.start_iter = start_iter
        self.stop_iter = start_iter + num_iters
        self._active = False

    def before_train(self, loop):
        pass

    def after_step(self, loop):
        it = loop.storage.iter
        if it == self.start_iter and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif it >= self.stop_iter and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def after_train(self, loop):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def step_timer():
    t0 = time.perf_counter()
    box = {}
    yield box
    box["seconds"] = time.perf_counter() - t0


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)

"""Metrics / logging / observability (SURVEY §5.5).

EventStorage + writers with the reference's surface: terminal printer,
metrics.json lines, optional TensorBoard (ref stage1_trainer.py:233-266,
d2 EventStorage). TPU note: metrics arrive as one device_get of a small
pytree per log period — cross-replica reduction happened in-step via
psum/pmean (ref's comm.gather at stage1_trainer.py:465 is replaced by
in-program collectives); data_time keeps the reference's max-across-hosts
semantics (stage1_trainer.py:468-482) via process_allgather when multihost.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

logger = logging.getLogger("afigan_tpu")


class EventStorage:
    def __init__(self, start_iter: int = 0, window: int = 20):
        self.iter = start_iter
        self._history = defaultdict(lambda: deque(maxlen=window))
        self._latest: Dict[str, float] = {}

    def put_scalar(self, name: str, value) -> None:
        v = float(value)
        self._history[name].append(v)
        self._latest[name] = v

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> Dict[str, float]:
        return dict(self._latest)

    def median(self, name: str) -> float:
        h = sorted(self._history[name])
        return h[len(h) // 2] if h else float("nan")

    def mean(self, name: str) -> float:
        h = self._history[name]
        return sum(h) / len(h) if h else float("nan")

    def step(self) -> None:
        self.iter += 1


class CommonMetricPrinter:
    def __init__(self, max_iter: int):
        self.max_iter = max_iter
        self._last_time: Optional[float] = None
        self._last_iter: Optional[int] = None

    def write(self, storage: EventStorage) -> None:
        now = time.perf_counter()
        it = storage.iter
        speed = ""
        if self._last_time is not None and it > self._last_iter:
            s_per_it = (now - self._last_time) / (it - self._last_iter)
            eta = s_per_it * (self.max_iter - it)
            speed = f" time: {s_per_it:.4f}s/it eta: {eta/3600:.2f}h"
        self._last_time, self._last_iter = now, it
        losses = "  ".join(
            f"{k}: {storage.median(k):.4g}"
            for k in sorted(storage.latest())
            if "loss" in k
        )
        lr = storage.latest().get("lr")
        lr_s = f" lr: {lr:.2e}" if lr is not None else ""
        logger.info(f"iter: {it}/{self.max_iter}  {losses}{lr_s}{speed}")


class JSONWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: EventStorage) -> None:
        rec = {"iteration": storage.iter, **storage.latest()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorboardWriter:
    """Optional: active only if tensorboardX/tensorboard is importable."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(log_dir)
        except ImportError:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._writer = SummaryWriter(log_dir)
            except Exception:
                logger.info("tensorboard unavailable; TB writer disabled")

    def write(self, storage: EventStorage) -> None:
        if self._writer is None:
            return
        for k, v in storage.latest().items():
            self._writer.add_scalar(k, v, storage.iter)

    def close(self):
        if self._writer is not None:
            self._writer.close()


def setup_logger(name: str = "afigan_tpu", output_dir: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    """Named loggers like the reference's "afi-gan"/"af-extractor"/...
    (ref stage1_trainer.py:51-53)."""
    lg = logging.getLogger(name)
    lg.setLevel(level)
    lg.propagate = False  # root logger may be configured (absl) → no dupes
    fmt = logging.Formatter("[%(asctime)s %(name)s]: %(message)s", "%m/%d %H:%M:%S")
    has_stream = any(
        isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
        for h in lg.handlers
    )
    if not has_stream:
        h = logging.StreamHandler()
        h.setFormatter(fmt)
        lg.addHandler(h)
    # the file handler is INDEPENDENT of the stream handler: a prior
    # setup_logger() without output_dir (tests, imports) must not
    # suppress log.txt for the actual run
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.abspath(os.path.join(output_dir, "log.txt"))
        has_file = any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == path
            for h in lg.handlers
        )
        if not has_file:
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            lg.addHandler(fh)
    return lg

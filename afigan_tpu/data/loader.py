"""Host input pipeline: samplers, bucketed batching, double buffering.

TPU redesign of the reference's DataLoader stack (SURVEY §2.2 "Data",
§7.4 hard-part 7): the reference uses torch DataLoader workers + aspect
-ratio grouping (ref stage1_trainer.py:617-626). Dynamic per-batch shapes
would force a recompile per batch on TPU, so instead:

  * images resize per INPUT.* then pad to a small FIXED set of canvas
    buckets (cfg.TPU.IMAGE_BUCKETS) — each bucket shape compiles once;
    aspect-ratio grouping falls out of bucket selection.
  * a ThreadPool maps records (decode/augment/rasterize) in parallel and
    a background prefetch queue keeps ≥2 batches ready (double buffering
    against the device step).
  * ``TrainingSampler`` mirrors d2's infinite rank-striped shuffled
    stream; each host takes its process_index stripe.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np

from ..ops.image_list import (choose_bucket, pad_to_canvas,
                              required_size_divisibility)


class TrainingSampler:
    """Infinite shuffled index stream, striped across hosts (d2 semantics)."""

    def __init__(self, size: int, seed: int = 0, shard_id: int = 0,
                 num_shards: int = 1, shuffle: bool = True):
        self.size = size
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            idx = np.arange(self.size)
            if self.shuffle:
                rng.shuffle(idx)
            yield from idx[self.shard_id :: self.num_shards].tolist()
            epoch += 1


class RepeatFactorTrainingSampler(TrainingSampler):
    """LVIS-style repeat-factor sampler (d2 parity; repeat_thresh on
    category frequency)."""

    def __init__(self, records: Sequence[Dict], repeat_thresh: float,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1):
        # category frequency over images
        from collections import Counter

        counts: Counter = Counter()
        for r in records:
            cats = {o["category_id"] for o in r.get("annotations", [])}
            counts.update(cats)
        n = max(len(records), 1)
        cat_repeat = {
            c: max(1.0, np.sqrt(repeat_thresh / (cnt / n))) for c, cnt in counts.items()
        }
        factors = []
        for r in records:
            cats = {o["category_id"] for o in r.get("annotations", [])}
            factors.append(max([cat_repeat.get(c, 1.0) for c in cats], default=1.0))
        self._factors = np.asarray(factors)
        super().__init__(len(records), seed, shard_id, num_shards)

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            # stochastic rounding of repeat factors
            rounded = np.floor(self._factors + rng.rand(len(self._factors)))
            idx = np.repeat(np.arange(self.size), rounded.astype(np.int64))
            rng.shuffle(idx)
            yield from idx[self.shard_id :: self.num_shards].tolist()
            epoch += 1


def _stack_gt(gts: List[Dict]) -> Dict:
    out = {k: np.stack([g[k] for g in gts]) for k in gts[0]}
    return out


def collate_batch(
    samples: List[Dict],
    buckets: Sequence[Sequence[int]],
    size_divisibility: int = 64,
    dual_scale: bool = False,
) -> Dict:
    """Pad + stack mapped samples into one static-shape batch."""
    imgs = [s["image"] for s in samples]
    max_h = max(i.shape[0] for i in imgs)
    max_w = max(i.shape[1] for i in imgs)
    canvas = choose_bucket(max_h, max_w, buckets, size_divisibility)
    batch = {
        "image": np.stack([pad_to_canvas(i, canvas) for i in imgs]),
        "image_sizes": np.asarray(
            [[i.shape[0], i.shape[1]] for i in imgs], np.int32
        ),
        "image_id": np.asarray([s["image_id"] for s in samples]),
        "orig_sizes": np.asarray(
            [[s["orig_height"], s["orig_width"]] for s in samples], np.int32
        ),
    }
    # dual-scale (stage-1/2) consumers only ever read gt_x0.5 — stage 1
    # uses no gt and stage 2 trains the detector on the half-res stream —
    # so skip stacking the full-res gt there: its (MAX_GT, canvas, canvas)
    # mask canvases are ~5 MB/record of pure collate/copy waste.
    if "gt" in samples[0] and not dual_scale:
        batch["gt"] = _stack_gt([s["gt"] for s in samples])
    if dual_scale:
        half_canvas = (canvas[0] // 2, canvas[1] // 2)
        halves = [s["image_x0.5"] for s in samples]
        batch["image_x0.5"] = np.stack(
            [pad_to_canvas(i, half_canvas) for i in halves]
        )
        batch["image_sizes_x0.5"] = np.asarray(
            [[i.shape[0], i.shape[1]] for i in halves], np.int32
        )
        if "gt_x0.5" in samples[0]:
            batch["gt_x0.5"] = _stack_gt([s["gt_x0.5"] for s in samples])
    return batch


class PrefetchingLoader:
    """Background-threaded map + prefetch queue (double buffering)."""

    def __init__(
        self,
        records: Sequence[Dict],
        sampler: Iterator[int],
        mapper: Callable[[Dict], Dict],
        batch_size: int,
        buckets: Sequence[Sequence[int]],
        dual_scale: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        size_divisibility: int = 64,
    ):
        self.records = records
        self.sampler = iter(sampler)
        self.mapper = mapper
        self.batch_size = batch_size
        self.buckets = buckets
        self.dual_scale = dual_scale
        self.size_divisibility = size_divisibility
        # NUM_WORKERS=0 is the d2 "serial/debug" convention; mapping
        # already happens off the main thread here, so a 1-thread pool is
        # the serial equivalent (ThreadPoolExecutor rejects 0).
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._exc: BaseException | None = None
        self.thread = threading.Thread(target=self._producer, daemon=True)
        self.thread.start()

    def _producer(self):
        try:
            while not self._stop.is_set():
                idxs = [next(self.sampler) for _ in range(self.batch_size)]
                mapped = list(
                    self.pool.map(lambda i: self.mapper(self.records[i]), idxs)
                )
                batch = collate_batch(
                    mapped, self.buckets, self.size_divisibility, self.dual_scale
                )
                self.q.put(batch)
        except StopIteration:
            pass
        except BaseException as e:
            # surface mapper/collate failures to the consumer — dying
            # silently here would end training with a clean-looking
            # StopIteration and no root cause
            self._exc = e
        finally:
            self.q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        batch = self.q.get()
        if batch is None:
            if self._exc is not None:
                raise RuntimeError(
                    "data-loader producer thread failed"
                ) from self._exc
            raise StopIteration
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.pool.shutdown(wait=False)


def build_train_loader(cfg, dataset, dual_scale: bool = False,
                       seed: int = 0, shard_id: int = 0, num_shards: int = 1):
    """ref build_afigan_train_loader / build_af_extractor_train_loader
    equivalent (stage1_trainer.py:556-640, stage2_trainer.py:508-592)."""
    from .dataset_mapper import DatasetMapper

    per_host_batch = cfg.SOLVER.IMS_PER_BATCH // num_shards
    assert cfg.SOLVER.IMS_PER_BATCH % num_shards == 0, (
        "SOLVER.IMS_PER_BATCH must be divisible by the number of hosts "
        "(ref stage1_trainer.py:577-589)"
    )
    if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
        sampler = RepeatFactorTrainingSampler(
            dataset.records, cfg.DATALOADER.REPEAT_THRESHOLD, seed, shard_id, num_shards
        )
    else:
        sampler = TrainingSampler(len(dataset.records), seed, shard_id, num_shards)
    mapper = DatasetMapper(
        cfg, is_train=True, dual_scale=dual_scale, seed=seed,
        keypoint_hflip_indices=getattr(dataset, "keypoint_hflip_indices", None),
    )
    return PrefetchingLoader(
        dataset.records, sampler, mapper, per_host_batch,
        cfg.TPU.IMAGE_BUCKETS, dual_scale, cfg.DATALOADER.NUM_WORKERS,
        size_divisibility=required_size_divisibility(cfg, dual_scale=dual_scale),
    )


def build_test_loader(cfg, dataset, batch_size: int = 1, records=None):
    """Sequential eval loader (single pass, padded batches).

    ``records``: optional subset of dataset.records (multi-process eval
    stripes records per rank and allgathers predictions)."""
    from .dataset_mapper import DatasetMapper

    mapper = DatasetMapper(cfg, is_train=False)
    div = required_size_divisibility(cfg)
    records = dataset.records if records is None else records

    def gen():
        buf = []
        for rec in records:
            buf.append(mapper(rec))
            if len(buf) == batch_size:
                yield collate_batch(buf, cfg.TPU.IMAGE_BUCKETS, div)
                buf = []
        if buf:
            n_real = len(buf)
            while len(buf) < batch_size:  # pad final batch by repetition
                buf.append(buf[-1])
            batch = collate_batch(buf, cfg.TPU.IMAGE_BUCKETS, div)
            # mark padding with image_id=-1 so evaluators skip the
            # duplicated sample instead of scoring it multiple times
            batch["image_id"][n_real:] = -1
            yield batch

    return gen()

"""Input-pipeline throughput: can the host loader feed the TPU step?

The stage-3 train step sustains ~24 img/s/chip (README perf table), and
bench.py measures it on device-resident synthetic batches — which is
only honest if the REAL host pipeline (JPEG decode -> dual/single-scale
DatasetMapper -> pad/collate into bucketed canvases -> prefetch queue)
can produce batches at least that fast. The reference hides this behind
torch DataLoader worker processes (ref stage1_trainer.py:617-626); our
TPU design uses a thread-pool mapper + double-buffered prefetch
(afigan_tpu/data/loader.py::PrefetchingLoader), so CPU-side throughput
is the number to prove.

Measures steady-state img/s of build_train_loader on a generated
structured-scene COCO set (realistic 640x480 JPEGs with polygon+RLE
instances, multi-scale 640-800 resize like the reference schedule) for
the stage-3 (single-scale) and stage-1/2 (dual-scale) mappers.

Pure host work (numpy/PIL); safe to run alongside a TPU job.

    python benchmarks/loader_bench.py [--workers 8] [--batches 40]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _load_scene_maker():
    spec = importlib.util.spec_from_file_location(
        "_valtrain", os.path.join(_REPO, "tools", "validate_training.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_scene_coco


def bench_loader(dual_scale: bool, json_path: str, img_dir: str,
                 workers: int, batches: int, batch_size: int) -> dict:
    from afigan_tpu.config import get_cfg
    from afigan_tpu.data.coco import CocoDataset
    from afigan_tpu.data.loader import build_train_loader

    cfg = get_cfg()
    # reference stage-3 training input schedule
    # (ref configs/Base-RCNN-FPN.yaml:40 multi-scale 640-800)
    cfg.INPUT.MIN_SIZE_TRAIN = (640, 672, 704, 736, 768, 800)
    cfg.INPUT.MAX_SIZE_TRAIN = 1333
    cfg.SOLVER.IMS_PER_BATCH = batch_size
    cfg.DATALOADER.NUM_WORKERS = workers
    cfg.MODEL.MASK_ON = True

    ds = CocoDataset(json_path, img_dir)
    loader = build_train_loader(cfg, ds, dual_scale=dual_scale)
    try:
        it = iter(loader)
        for _ in range(4):  # warmup: fill the prefetch queue + thread pool
            next(it)
        t0 = time.perf_counter()
        for _ in range(batches):
            next(it)
        dt = time.perf_counter() - t0
    finally:
        loader.close()
    return {
        "mapper": "dual_scale" if dual_scale else "single_scale",
        "imgs_per_sec": round(batches * batch_size / dt, 2),
        "batch_size": batch_size,
        "workers": workers,
        "batches": batches,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int,
                    default=int(os.environ.get("LOADER_WORKERS", "8")))
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--images", type=int, default=64)
    args = ap.parse_args()

    make_scene_coco = _load_scene_maker()
    with tempfile.TemporaryDirectory() as root:
        # realistic COCO-ish inputs: 640x480 JPEGs, several instances each
        json_path, img_dir = make_scene_coco(
            root, num_images=args.images, hw=(480, 640), num_classes=3, seed=0
        )
        for dual in (False, True):
            r = bench_loader(dual, json_path, img_dir, args.workers,
                             args.batches, args.batch_size)
            # the rate the device side consumes at (README perf table)
            r["train_step_imgs_per_sec"] = 24.13 if not dual else 17.11
            r["headroom_x"] = round(
                r["imgs_per_sec"] / r["train_step_imgs_per_sec"], 2
            )
            print(json.dumps(r))


if __name__ == "__main__":
    main()

"""AOT memory analysis of the stage-3 train step WITHOUT executing it.

Usage: BENCH_BATCH=16 BENCH_REMAT=selective python benchmarks/memcheck_stage3.py

Compiles the exact program bench.py would run and prints XLA's
memory_analysis() — argument/output/temp/generated-code bytes — so an
HBM-overflowing configuration is caught BEFORE it allocates on the chip
(an overflow inside a Pallas DMA crashes the TPU worker for hours; see
.claude/skills/verify/SKILL.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.stage3 import init_stage3_state, make_stage3_train_step
from afigan_tpu.models.roi_heads import GroundTruth


def main():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/step3_afigan_mask_rcnn_R_50_FPN_3x.yaml")
    cfg.MODEL.AFI_FREEZE = False
    if os.environ.get("BENCH_REMAT"):
        cfg.TPU.REMAT = True
        if os.environ["BENCH_REMAT"] == "selective":
            cfg.TPU.REMAT_MODE = "selective"
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    if os.environ.get("BENCH_ACCUM"):
        cfg.TPU.GRAD_ACCUM = int(os.environ["BENCH_ACCUM"])
    elif batch >= 12 and not cfg.TPU.REMAT:
        cfg.TPU.GRAD_ACCUM = -(-batch // 8)  # mirror bench.py's guard
    h, w = 800, 1344
    max_gt = 64

    rng = np.random.RandomState(0)
    num_boxes = 12
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    valid = np.zeros((batch, max_gt), bool)
    for i in range(batch):
        xy = rng.rand(num_boxes, 2) * [w - 100, h - 100]
        wh = rng.rand(num_boxes, 2) * 180 + 20
        boxes[i, :num_boxes] = np.concatenate([xy, xy + wh], 1)
        valid[i, :num_boxes] = True

    data = {
        "image": jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.asarray([[h, w]] * batch, jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(
                rng.randint(0, 80, size=(batch, max_gt)).astype(np.int32)
            ),
            valid=jnp.asarray(valid),
            masks=jnp.asarray(rng.rand(batch, max_gt, 28, 28).astype(np.float32)),
        ),
    }

    state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(h, w),
                              max_gt=max_gt)
    step = make_stage3_train_step(cfg)
    key = jax.random.PRNGKey(1)

    compiled = step.lower(state, data, key).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        print("memory_analysis unavailable on this backend", file=sys.stderr)
        return
    gib = 1024 ** 3
    fields = [
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "generated_code_size_in_bytes",
        "alias_size_in_bytes",
    ]
    total = 0
    for f in fields:
        v = getattr(mem, f, None)
        if v is None:
            continue
        print(f"{f}: {v / gib:.3f} GiB")
        if f in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "generated_code_size_in_bytes"):
            total += v
    alias = getattr(mem, "alias_size_in_bytes", 0) or 0
    # aliased (donated) buffers are counted in both args and outputs
    total -= alias
    print(f"peak estimate (arg+out+temp+code-alias): {total / gib:.3f} GiB "
          f"(chip HBM ~15.75 GiB)")


if __name__ == "__main__":
    main()

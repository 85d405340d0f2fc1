"""Component-level TPU timing: where does the train step spend time?

Run on the real chip:  python benchmarks/component_bench.py
Prints per-component times for batch BENCH_BATCH at 800x1344.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_backbone, build_model
    from afigan_tpu.models.afi import AFIGenerator

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/step3_afigan_mask_rcnn_R_50_FPN_3x.yaml")

    b = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)

    # --- backbone + FPN(AFI) forward ---
    bk = build_backbone(cfg, train=True)
    bk_vars = jax.jit(lambda: bk.init(jax.random.PRNGKey(0), images))()
    f = jax.jit(lambda v, x: bk.apply(v, x))
    t = timeit(f, bk_vars, images)
    print(f"backbone+FPN(AFI) fwd: {t*1e3:.1f} ms  ({b/t:.1f} img/s)")

    # --- backbone with nearest interp (isolate AFI cost) ---
    cfg2 = cfg.clone()
    cfg2.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    bk2 = build_backbone(cfg2, train=True)
    bk2_vars = jax.jit(lambda: bk2.init(jax.random.PRNGKey(0), images))()
    f2 = jax.jit(lambda v, x: bk2.apply(v, x))
    t2 = timeit(f2, bk2_vars, images)
    print(f"backbone+FPN(nearest) fwd: {t2*1e3:.1f} ms")

    # --- standalone AFI generator at p3->p2 size (the hot call) ---
    gen = AFIGenerator(dtype=jnp.bfloat16)
    gx = jnp.asarray(rng.rand(b, h // 8, w // 8, 256).astype(np.float32))
    gvars = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), gx))()
    g = jax.jit(lambda v, x: gen.apply(v, x))
    t3 = timeit(g, gvars, gx)
    print(f"AFI generator fwd (p3 {h//8}x{w//8}): {t3*1e3:.1f} ms")

    # fused pallas variant
    genf = AFIGenerator(dtype=jnp.bfloat16, fused=True)
    gf = jax.jit(lambda v, x: genf.apply(v, x))
    try:
        t4 = timeit(gf, gvars, gx)
        print(f"AFI generator fwd FUSED: {t4*1e3:.1f} ms")
    except Exception as e:
        print("fused generator failed:", repr(e)[:300])

    # --- RPN proposal generation (NMS path) in isolation ---
    from afigan_tpu.models.rpn import generate_proposals
    from afigan_tpu.ops import Box2BoxTransform
    from afigan_tpu.ops.anchors import AnchorGenerator

    shapes = [(h // s, w // s) for s in (4, 8, 16, 32, 64)]
    gen_a = AnchorGenerator([[32], [64], [128], [256], [512]], [[0.5, 1.0, 2.0]],
                            [4, 8, 16, 32, 64])
    anchors = gen_a(shapes)
    logits = [jnp.asarray(rng.rand(b, hh, ww, 3).astype(np.float32)) for hh, ww in shapes]
    deltas = [jnp.asarray(rng.rand(b, hh, ww, 12).astype(np.float32) * 0.1) for hh, ww in shapes]
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    bb = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    rp = jax.jit(
        lambda lg, dl: generate_proposals(anchors, lg, dl, sizes, bb, 2000, 1000, 0.7)
    )
    t5 = timeit(rp, logits, deltas)
    print(f"RPN proposal gen (topk+decode+NMS): {t5*1e3:.1f} ms")

    # --- ROI pooling in isolation ---
    from afigan_tpu.ops import multilevel_roi_align

    feats = [
        jnp.asarray(rng.rand(h // s, w // s, 256).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    rois = jnp.asarray(
        np.concatenate([rng.rand(512, 2) * 800, rng.rand(512, 2) * 200 + 820], 1).astype(
            np.float32
        )
    )
    pool = jax.jit(lambda fs, r: multilevel_roi_align(fs, r, [4, 8, 16, 32], 7, 2))
    t6 = timeit(pool, feats, rois)
    print(f"multilevel ROIAlign (512 rois, 1 img): {t6*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Flagship component timing: where does Cascade Swin-L BiFPN+AFI spend time?

Run on the real chip:  python benchmarks/profile_flagship.py
Times (chained, best-of-REPEATS) at the bench.py flagship shapes
(896x1408 canvas, BENCH_BATCH default 4):

  1. Swin-L bottom-up alone
  2. Swin-L + BiFPN(AFI)        -> BiFPN+AFI cost by difference
  3. Swin-L + BiFPN(nearest)    -> the 28 AFI generator calls by difference
  4. full model (RPN + cascade heads + NMS by difference from 2)

Each part is a separate ~10-min XLA compile at these shapes, which blows
any single-run budget (a full 4-part run timed out at 30 min with zero
results). PROFILE_PART=swin|afi|nn|full selects ONE part per invocation;
run the parts back-to-back and do the subtraction by hand (each prints
its own ms/step + img/s line).
"""

import os
import sys

from _timing import chained_timed  # noqa: E402  (sets up sys.path/cache)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_backbone, build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/inference/AFI-GAN_cascade_rcnn_swint_BiFPN_ST.yaml"
    )
    b = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 896, 1408
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)

    def bench_backbone(name, label):
        bk = build_backbone(cfg, name=name, train=False)
        bk_vars = jax.jit(lambda: bk.init(jax.random.PRNGKey(0), images))()
        f = jax.jit(lambda x: (bk.apply(bk_vars, x), x))

        def fn(x):
            out, _ = f(x)
            # chain: next input depends on this output
            lvl = sorted(out)[0]
            return images + out[lvl].astype(jnp.float32)[0, 0, 0, 0] * 0

        t = chained_timed(label, fn, images, imgs_per_iter=b)
        return t

    part = os.environ.get("PROFILE_PART", "full")

    if part == "swin":
        # 1) Swin-L bottom-up alone
        from afigan_tpu.models.swin import build_swin

        swin = build_swin(cfg, train=False, dtype=jnp.bfloat16)
        sw_in = images.astype(jnp.bfloat16)
        sw_vars = jax.jit(lambda: swin.init(jax.random.PRNGKey(0), sw_in))()
        fsw = jax.jit(lambda x: swin.apply(sw_vars, x))

        def swin_fn(x):
            out = fsw(x)
            return sw_in + out["stage3"].astype(jnp.bfloat16)[0, 0, 0, 0] * 0

        chained_timed("swin-L bottom-up", swin_fn, sw_in, imgs_per_iter=b)
    elif part == "afi":
        # 2) Swin + BiFPN(AFI): subtract the swin part for the BiFPN+AFI cost
        bench_backbone("build_swint_bifpn_sr_backbone", "swin+BiFPN(AFI)")
    elif part == "nn":
        # 3) Swin + BiFPN(nearest): (afi - nn) = the 28 AFI generator calls
        bench_backbone("build_swint_bifpn_backbone", "swin+BiFPN(NN)")
    elif part == "full":
        # 4) full model: (full - afi) = RPN + cascade heads + NMS
        model = build_model(cfg, train=False)
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
        )()
        # (v, x) signature == bench.py's flagship program -> compile-cache hit
        fwd = jax.jit(lambda v, x: model.apply(v, x, sizes))

        def full_fn(x):
            dets, _ = fwd(variables, x)
            return images + dets.scores[0, 0] * 0

        chained_timed("full flagship", full_fn, images, imgs_per_iter=b)
    else:
        raise SystemExit(f"unknown PROFILE_PART={part!r} (swin|afi|nn|full)")


if __name__ == "__main__":
    main()

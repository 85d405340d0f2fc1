"""Chained component timing — every call depends on the previous output,
so dispatch pipelining / memoization cannot fake the numbers."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained(fn, x, iters=10):
    import jax

    y = fn(x)
    jax.device_get(jax.tree.leaves(y)[0])  # axon: device_get is the only true sync
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.device_get(jax.tree.leaves(y)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_backbone

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/step3_afigan_mask_rcnn_R_50_FPN_3x.yaml")
    b = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)

    # backbone fwd (chain: feed p2-derived image back)
    bk = build_backbone(cfg, train=True)
    bk_vars = jax.jit(lambda: bk.init(jax.random.PRNGKey(0), images))()

    def bk_step(x):
        f = bk.apply(bk_vars, x)
        # make next input depend on output
        return x + jnp.mean(f["p2"]).astype(x.dtype) * 0 + jnp.max(f["p5"]) * 1e-9

    t = chained(jax.jit(bk_step), images)
    print(f"backbone+FPN(AFI) fwd chained: {t*1e3:.1f} ms ({b/t:.1f} img/s)", flush=True)

    cfg2 = cfg.clone()
    cfg2.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    bk2 = build_backbone(cfg2, train=True)
    bk2_vars = jax.jit(lambda: bk2.init(jax.random.PRNGKey(0), images))()

    def bk2_step(x):
        f = bk2.apply(bk2_vars, x)
        return x + jnp.max(f["p5"]) * 1e-9

    t = chained(jax.jit(bk2_step), images)
    print(f"backbone+FPN(nearest) fwd chained: {t*1e3:.1f} ms", flush=True)

    # RPN proposal gen chained
    from afigan_tpu.models.rpn import generate_proposals
    from afigan_tpu.ops import Box2BoxTransform
    from afigan_tpu.ops.anchors import AnchorGenerator

    shapes = [(h // s, w // s) for s in (4, 8, 16, 32, 64)]
    gen_a = AnchorGenerator([[32], [64], [128], [256], [512]], [[0.5, 1.0, 2.0]],
                            [4, 8, 16, 32, 64])
    anchors = gen_a(shapes)
    logits = [jnp.asarray(rng.rand(b, hh, ww, 3).astype(np.float32)) for hh, ww in shapes]
    deltas = [jnp.asarray(rng.rand(b, hh, ww, 12).astype(np.float32) * 0.1)
              for hh, ww in shapes]
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    bb = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))

    def rpn_step(lg0):
        out = generate_proposals(anchors, [lg0] + logits[1:], deltas, sizes, bb,
                                 2000, 1000, 0.7)
        return lg0 + jnp.max(out.scores) * 1e-9

    t = chained(jax.jit(rpn_step), logits[0])
    print(f"RPN proposal gen chained: {t*1e3:.1f} ms", flush=True)

    # ROIAlign chained (batch b x 512 rois)
    from afigan_tpu.ops import multilevel_roi_align

    feats = [
        jnp.asarray(rng.rand(b, h // s, w // s, 256).astype(np.float32)).astype(jnp.bfloat16)
        for s in (4, 8, 16, 32)
    ]
    rois = jnp.asarray(
        np.tile(
            np.concatenate(
                [rng.rand(512, 2) * 800, rng.rand(512, 2) * 200 + 820], 1
            )[None],
            (b, 1, 1),
        ).astype(np.float32)
    )

    def pool_step(r):
        out = jax.vmap(
            lambda fs0, fs1, fs2, fs3, rr: multilevel_roi_align(
                [fs0, fs1, fs2, fs3], rr, [4, 8, 16, 32], 7, 2
            )
        )(*feats, r)
        return r + jnp.max(out).astype(r.dtype) * 1e-9

    t = chained(jax.jit(pool_step), rois)
    print(f"multilevel ROIAlign chained ({b}x512 rois): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__" and not os.environ.get("POOL_AB"):
    main()


def pooling_ab():
    """A/B the two pooler implementations on TPU."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.ops import multilevel_roi_align
    from afigan_tpu.ops.roi_align import multilevel_roi_align_windowed

    b = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.rand(b, h // s, w // s, 256).astype(np.float32)).astype(jnp.bfloat16)
        for s in (4, 8, 16, 32)
    ]
    rois_np = np.concatenate(
        [rng.rand(512, 2) * 1000, rng.rand(512, 2) * 300], 1
    ).astype(np.float32)
    rois_np[:, 2:] += rois_np[:, :2] + 8  # x2 = x1 + w
    rois = jnp.asarray(np.tile(rois_np[None], (b, 1, 1)))

    for name, impl in [("gather", multilevel_roi_align),
                       ("windowed", multilevel_roi_align_windowed)]:
        def pool_step(r, impl=impl):
            out = jax.vmap(
                lambda f0, f1, f2, f3, rr: impl(
                    [f0, f1, f2, f3], rr, [4, 8, 16, 32], 7, 2
                )
            )(*feats, r)
            return r + jnp.max(out).astype(r.dtype) * 1e-9

        t = chained(jax.jit(pool_step), rois)
        print(f"pool[{name}] fwd chained: {t*1e3:.1f} ms", flush=True)

        def pool_grad(r, impl=impl):
            def loss(f0):
                out = jax.vmap(
                    lambda f0_, f1, f2, f3, rr: impl(
                        [f0_, f1, f2, f3], rr, [4, 8, 16, 32], 7, 2
                    )
                )(f0, *feats[1:], r)
                return jnp.sum(out.astype(jnp.float32))

            g = jax.grad(loss)(feats[0])
            return r + jnp.max(g).astype(r.dtype) * 1e-9

        t = chained(jax.jit(pool_grad), rois, iters=5)
        print(f"pool[{name}] fwd+bwd chained: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("POOL_AB"):
    pooling_ab()

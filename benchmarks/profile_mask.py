"""Mask-branch sub-ladder: the full stage-3 ladder showed the mask branch
costs ~210 ms/step (39%). Attribute it: pooling fwd/bwd, head fwd/bwd,
target crop, loss — each timed as its own chained jit program on real
shapes (batch 8, 800x1344 pyramid, 128 fg ROIs/img, P=14).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import chained_timed

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.models.mask_head import MaskRCNNConvUpsampleHead, crop_and_resize_masks, mask_loss
from afigan_tpu.ops.roi_align import (
    multilevel_roi_align_fast,
    multilevel_roi_align_pallas,
)

POOLER = os.environ.get("POOLER", "pallas")  # match TPU.POOLER_IMPL default

B, FG, C, P = 8, 128, 256, 14
H, W = 800, 1344
MAX_GT = 64
DT = jnp.bfloat16
STRIDES = (4, 8, 16, 32)


def feats_and_boxes():
    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.rand(B, H // s, W // s, C).astype(np.float32), DT)
        for s in STRIDES
    )
    boxes = np.zeros((B, FG, 4), np.float32)
    xy = rng.rand(B, FG, 2) * [W - 200, H - 200]
    wh = rng.rand(B, FG, 2) * 180 + 20
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    return feats, jnp.asarray(boxes)


def timed(name, fn, state):
    return chained_timed(name, fn, state, label_width=16)


def main():
    feats, boxes = feats_and_boxes()
    head = MaskRCNNConvUpsampleHead(num_classes=80, num_conv=4, dtype=DT)
    pooled0 = jnp.zeros((B * FG, P, P, C), DT)
    hv = head.init(jax.random.PRNGKey(0), pooled0)

    rng = np.random.RandomState(1)
    gt_masks = jnp.asarray(rng.rand(B, MAX_GT, 28, 28).astype(np.float32))
    gt_boxes = boxes[:, :MAX_GT]
    gt_idx = jnp.asarray(rng.randint(0, MAX_GT, (B, FG)), jnp.int32)
    classes = jnp.asarray(rng.randint(0, 80, (B * FG,)), jnp.int32)
    valid = jnp.ones((B * FG,), bool)

    def pool(fs, bx):
        if POOLER == "pallas":
            return multilevel_roi_align_pallas(tuple(fs), bx, STRIDES, P, 2, True)
        return jax.vmap(lambda *a: multilevel_roi_align_fast(
            tuple(a[:-1]), a[-1], STRIDES, P, 2, True))(*fs, bx)

    # 1. pooling forward only (chained via features)
    @jax.jit
    def pool_fwd(fs):
        out = pool(fs, boxes)
        s = jnp.sum(out.astype(jnp.float32)) * 1e-12
        return tuple(f + s.astype(DT) for f in fs)

    timed("pool_fwd", pool_fwd, feats)

    # 2. pooling fwd+bwd (grad wrt features; scatter backward)
    @jax.jit
    def pool_fwdbwd(fs):
        g = jax.grad(
            lambda f: jnp.sum(pool(f, boxes).astype(jnp.float32)) * 1e-12
        )(fs)
        return tuple(f + gg.astype(DT) for f, gg in zip(fs, g))

    timed("pool_fwdbwd", pool_fwdbwd, feats)

    # 3. head fwd+bwd (params grad)
    @jax.jit
    def head_fwdbwd(carry):
        params, x = carry

        def loss(p):
            logits = head.apply({"params": p}, x)
            return jnp.sum(logits.astype(jnp.float32)) * 1e-12

        g = jax.grad(loss)(params)
        new = jax.tree.map(lambda a, b: a - 0.0 * b, params, g)
        return new, x

    timed("head_fwdbwd", head_fwdbwd, (hv["params"], jnp.asarray(
        np.random.RandomState(2).rand(B * FG, P, P, C), DT)))

    # 4. crop targets only
    @jax.jit
    def crop_only(gm):
        t = jax.vmap(
            lambda m, gb, rb, gi: crop_and_resize_masks(m, gb, rb, gi, 28)
        )(gm, gt_boxes, boxes, gt_idx)
        return gm + jnp.sum(t) * 1e-12

    timed("crop_only", crop_only, gt_masks)

    # 5. full branch: pool -> head -> crop -> loss, grads wrt feats+params
    @jax.jit
    def full_branch(carry):
        fs, params = carry

        def loss(f, p):
            pooled = pool(f, boxes)
            logits = head.apply({"params": p}, pooled.reshape(B * FG, P, P, C).astype(DT))
            targets = jax.vmap(
                lambda m, gb, rb, gi: crop_and_resize_masks(m, gb, rb, gi,
                                                            logits.shape[1])
            )(gt_masks, gt_boxes, boxes, gt_idx)
            return mask_loss(logits, targets.reshape(B * FG, 28, 28),
                             classes, valid, 80)

        gf, gp = jax.grad(loss, argnums=(0, 1))(fs, params)
        return (tuple(f + g.astype(DT) * 0 for f, g in zip(fs, gf)),
                jax.tree.map(lambda a, b: a - 0.0 * b, params, gp))

    timed("full_branch", full_branch, (feats, hv["params"]))


if __name__ == "__main__":
    main()

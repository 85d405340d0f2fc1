"""On-chip A/B of the RPN proposal-NMS structure (exact-equivalence).

The offset-trick batched NMS concatenates ~8.8k level-topk boxes per
image and walks ONE early-exiting block chain (~25-70 sequential blocks
of 128). But level-offset NMS never suppresses across levels, so the
numerics-identical alternative stacks levels into a (batch*level, 2048)
vmapped NMS — a 16-block chain with wider lanes — then merges with one
global top-k. This probe measures both on realistic RPN-like inputs.

State is a few MB (boxes/scores), so chained timing is honest here
(verify skill: only LARGE chained buffers hit the harness floor).

    python benchmarks/probe_nms.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from _timing import chained_timed

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.ops.nms import batched_nms_padded, nms_padded

B = 8
POST = 1000
NMS_T = 0.7
# per-level pre-NMS top-k counts at 800x1344 (p2..p6, A=3)
LEVEL_K = [2000, 2000, 2000, 2000, 819]


def make_inputs(seed=0):
    """RPN-like boxes: clustered centers, mixed sizes, correlated scores
    (top-scored boxes overlap heavily, like real RPN output)."""
    rng = np.random.RandomState(seed)
    boxes_l, scores_l = [], []
    for lvl, k in enumerate(LEVEL_K):
        scale = 32 * (2 ** lvl)
        # clustered around a handful of object centers
        centers = rng.rand(B, 24, 2) * [1344, 800]
        pick = rng.randint(0, 24, size=(B, k))
        ctr = np.take_along_axis(
            centers, pick[..., None].repeat(2, -1), axis=1
        ) + rng.randn(B, k, 2) * scale * 0.5
        wh = np.exp(rng.randn(B, k, 2) * 0.4) * scale
        b = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
        b[..., 0::2] = b[..., 0::2].clip(0, 1344)
        b[..., 1::2] = b[..., 1::2].clip(0, 800)
        boxes_l.append(b)
        scores_l.append(rng.rand(B, k).astype(np.float32))
    return boxes_l, scores_l


def current_path(boxes_l, scores_l, block_size=128):
    boxes = jnp.concatenate(boxes_l, axis=1)
    scores = jnp.concatenate(scores_l, axis=1)
    levels = jnp.concatenate(
        [jnp.full((B, b.shape[1]), i, jnp.int32) for i, b in enumerate(boxes_l)],
        axis=1,
    )

    def per_image(bi, si, li):
        return batched_nms_padded(
            bi, si, li, NMS_T, POST, block_size=block_size
        )[:2]

    ob, osc = jax.vmap(per_image)(boxes, scores, levels)
    return ob, osc


def stacked_path(boxes_l, scores_l):
    kmax = max(LEVEL_K)
    bs, ss, vs = [], [], []
    for b, s in zip(boxes_l, scores_l):
        pad = kmax - b.shape[1]
        bs.append(jnp.pad(b, ((0, 0), (0, pad), (0, 0))))
        ss.append(jnp.pad(s, ((0, 0), (0, pad))))
        vs.append(jnp.pad(jnp.ones(s.shape, bool), ((0, 0), (0, pad))))
    boxes = jnp.stack(bs, 1).reshape(B * len(LEVEL_K), kmax, 4)
    scores = jnp.stack(ss, 1).reshape(B * len(LEVEL_K), kmax)
    valid = jnp.stack(vs, 1).reshape(B * len(LEVEL_K), kmax)

    def per_lane(bi, si, vi):
        ob, osc, _, ov = nms_padded(bi, si, NMS_T, POST, valid=vi)
        return ob, jnp.where(ov, osc, -1.0e10)

    ob, osc = jax.vmap(per_lane)(boxes, scores, valid)  # (B*L, POST, ...)
    ob = ob.reshape(B, -1, 4)
    osc = osc.reshape(B, -1)
    top, sel = jax.lax.top_k(osc, POST)
    return jnp.take_along_axis(ob, sel[..., None], axis=1), top


def main():
    boxes_l, scores_l = make_inputs()
    boxes_l = [jnp.asarray(b) for b in boxes_l]
    scores_l = [jnp.asarray(s) for s in scores_l]

    cur = jax.jit(lambda bl, sl: current_path(bl, sl))
    stk = jax.jit(lambda bl, sl: stacked_path(bl, sl))

    cb, cs = cur(boxes_l, scores_l)
    sb, ss_ = stk(boxes_l, scores_l)
    cs_h, ss_h = np.asarray(cs), np.asarray(ss_)
    # equivalence: the kept score MULTISET must match (box order may
    # differ on exact ties)
    np.testing.assert_allclose(
        np.sort(cs_h, axis=1), np.sort(ss_h, axis=1), atol=1e-6
    )
    print("exact-equivalence of kept score sets: OK", file=sys.stderr)

    # chained timing: perturb scores by a value-preserving epsilon chain
    def run_cur(st):
        sl2 = [s + st for s in scores_l]
        ob, osc = cur(boxes_l, sl2)
        return (osc[0, 0] * 0.0,)

    def run_stk(st):
        sl2 = [s + st for s in scores_l]
        ob, osc = stk(boxes_l, sl2)
        return (osc[0, 0] * 0.0,)

    chained_timed("current", lambda st: (run_cur(st[0]), None), (jnp.float32(0.0),),
                  state_of=lambda out: out[0], label_width=10, imgs_per_iter=B)
    chained_timed("stacked", lambda st: (run_stk(st[0]), None), (jnp.float32(0.0),),
                  state_of=lambda out: out[0], label_width=10, imgs_per_iter=B)

    # block-size sweep of the current path (sequential chain length vs
    # per-block IoU width; all sizes are exact — same greedy result).
    # OPT-IN: a run of this sweep crashed the axon TPU worker
    # (2026-08-19, "TPU worker process crashed or restarted", recovered
    # in minutes) — plain XLA, a few MB of state, crash point unknown
    # (tail-truncated log). Do not run against the shared chip without
    # budgeting for a worker restart.
    if os.environ.get("PROBE_BLOCK_SWEEP", "0") != "1":
        print("block-size sweep skipped (PROBE_BLOCK_SWEEP=1 to enable)",
              file=sys.stderr)
        return
    sizes = tuple(
        int(x) for x in
        os.environ.get("PROBE_BLOCK_SIZES", "64,256,384,512").split(",")
    )
    for bs in sizes:
        f = jax.jit(lambda bl, sl, _bs=bs: current_path(bl, sl, block_size=_bs))
        cb2, cs2 = f(boxes_l, scores_l)
        np.testing.assert_allclose(
            np.sort(np.asarray(cs2), axis=1), np.sort(cs_h, axis=1), atol=1e-6
        )

        def run_bs(st, _f=f):
            sl2 = [s + st for s in scores_l]
            _, osc = _f(boxes_l, sl2)
            return (osc[0, 0] * 0.0,)

        chained_timed(f"blk={bs}", lambda st: (run_bs(st[0]), None),
                      (jnp.float32(0.0),), state_of=lambda out: out[0],
                      label_width=10, imgs_per_iter=B)


if __name__ == "__main__":
    main()

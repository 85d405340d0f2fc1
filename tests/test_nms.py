"""NMS parity tests against a naive python reference (torchvision semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.ops import batched_nms_padded, nms_keep_mask, nms_padded


def _naive_nms(boxes, scores, thr):
    """Greedy NMS, returns kept original indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] > scores[i]:
                continue
            iou = _iou(boxes[i], boxes[j])
            if iou > thr:
                suppressed[j] = True
    return keep


def _iou(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def _random_boxes_scores(n, seed):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * 80
    wh = rng.rand(n, 2) * 40 + 4
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_nms_matches_naive():
    for seed in range(3):
        boxes, scores = _random_boxes_scores(200, seed)
        want = _naive_nms(boxes, scores, 0.5)
        ob, osc, oi, ov = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 200)
        got = list(np.asarray(oi)[np.asarray(ov)])
        assert got == want, f"seed {seed}: {got[:10]} vs {want[:10]}"


def test_nms_crosses_block_boundary():
    # >128 boxes forces multi-block path
    boxes, scores = _random_boxes_scores(500, 7)
    want = _naive_nms(boxes, scores, 0.6)
    _, _, oi, ov = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 500)
    got = list(np.asarray(oi)[np.asarray(ov)])
    assert got == want


def test_nms_respects_validity_mask():
    boxes, scores = _random_boxes_scores(64, 1)
    valid = np.zeros(64, dtype=bool)
    valid[:10] = True
    _, _, oi, ov = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64, valid=jnp.asarray(valid)
    )
    kept = np.asarray(oi)[np.asarray(ov)]
    assert all(k < 10 for k in kept)
    want = _naive_nms(boxes[:10], scores[:10], 0.5)
    assert list(kept) == want


def test_batched_nms_isolates_classes():
    # identical overlapping boxes in different classes must all survive
    boxes = np.tile(np.array([[10, 10, 50, 50]], dtype=np.float32), (3, 1))
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    idxs = np.array([0, 1, 2], dtype=np.int32)
    _, _, oi, ov = batched_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5, 3
    )
    assert int(np.asarray(ov).sum()) == 3


def test_nms_max_out_truncation():
    boxes, scores = _random_boxes_scores(300, 3)
    want = _naive_nms(boxes, scores, 0.9)  # high thr → many survivors
    k = 5
    _, _, oi, ov = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.9, k)
    got = list(np.asarray(oi)[np.asarray(ov)])
    assert got == want[:k]


def test_nms_vmapped_early_exit_non_block_multiple():
    """Regression: vmapped early-exit NMS at an n that is NOT a multiple of
    the 128 block size. The original formulation padded the sorted arrays
    with an in-function concatenate; under vmap, XLA's
    while-loop-invariant-code-motion pass miscompiled that program into
    deterministically wrong keep masks (jax 0.9.0, CPU and TPU). The
    clamped-last-block rewrite has no pad-concat and must match the naive
    reference exactly. This is the live RPN shape class (concat of
    per-level top-k ≈ 8819 boxes → pad 13)."""
    B, n, max_out = 4, 520, 64
    all_boxes, all_scores, refs = [], [], []
    for b in range(B):
        boxes, scores = _random_boxes_scores(n, 100 + b)
        all_boxes.append(boxes)
        all_scores.append(scores)
        refs.append(_naive_nms(boxes, scores, 0.5)[:max_out])
    fn = jax.jit(
        jax.vmap(lambda bb, ss: nms_padded(bb, ss, 0.5, max_out))
    )
    _, _, oi, ov = fn(jnp.asarray(np.stack(all_boxes)), jnp.asarray(np.stack(all_scores)))
    for b in range(B):
        got = list(np.asarray(oi[b])[np.asarray(ov[b])])
        assert got == refs[b], f"batch {b}: {got[:8]} vs {refs[b][:8]}"


def test_nms_early_termination_prefix_exact():
    """stop_after early exit must yield exactly the same top-max_out
    survivors as the fully-processed mask (prefix property), at RPN scale
    (thousands of candidates, heavy suppression)."""
    rng = np.random.RandomState(7)
    n, max_out = 4096, 256
    centers = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 60 + 10
    boxes = jnp.asarray(
        np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    )
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    full = nms_padded(boxes, scores, 0.5, max_out)
    ob, osc, oi, ov = full
    order, keep = nms_keep_mask(boxes, scores, 0.5, stop_after=max_out)
    _, sel = jax.lax.top_k(keep.astype(jnp.int32), max_out)
    np.testing.assert_array_equal(np.asarray(order[sel]), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(keep[sel]), np.asarray(ov))


def test_nms_vmapped_small_n_below_block_size():
    """n < the 128 block size exercises the block_size=min(block_size,n)
    clamp (single full-array block) under vmap + jit."""
    B, n, max_out = 3, 40, 40
    all_boxes, all_scores, refs = [], [], []
    for b in range(B):
        boxes, scores = _random_boxes_scores(n, 300 + b)
        all_boxes.append(boxes)
        all_scores.append(scores)
        refs.append(_naive_nms(boxes, scores, 0.5)[:max_out])
    fn = jax.jit(jax.vmap(lambda bb, ss: nms_padded(bb, ss, 0.5, max_out)))
    _, _, oi, ov = fn(jnp.asarray(np.stack(all_boxes)), jnp.asarray(np.stack(all_scores)))
    for b in range(B):
        got = list(np.asarray(oi[b])[np.asarray(ov[b])])
        assert got == refs[b], f"batch {b}: {got[:8]} vs {refs[b][:8]}"


import os
import pytest


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW_NMS", "0") != "1",
    reason="~8 min on CPU; run manually: RUN_SLOW_NMS=1 pytest tests/test_nms.py -k production_shape",
)
def test_nms_production_shape_compiled_matches_eager():
    """Pin the exact production RPN shape class (per-level top-k concat:
    2000*4 + 819 = 8819 boxes, 13 short of a 128-block multiple, vmapped
    over the batch). The round-3 XLA while-loop-ICM miscompile produced
    deterministically wrong keep masks at exactly this class while the
    same jaxpr executed eagerly was correct — so compiled-vs-eager
    equality at this shape is the regression oracle."""
    B, post = 2, 1000
    level_k = [2000, 2000, 2000, 2000, 819]
    rng = np.random.RandomState(0)
    boxes_l, scores_l, levels_l = [], [], []
    for lvl, k in enumerate(level_k):
        scale = 32 * (2 ** lvl)
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
        levels_l.append(np.full((B, k), lvl, np.int32))
    boxes = jnp.asarray(np.concatenate(boxes_l, 1))
    scores = jnp.asarray(np.concatenate(scores_l, 1))
    levels = jnp.asarray(np.concatenate(levels_l, 1))

    run = jax.vmap(lambda b, s, l: batched_nms_padded(b, s, l, 0.7, post))
    _, _, oi, ov = jax.tree.map(np.asarray, jax.jit(run)(boxes, scores, levels))
    with jax.disable_jit():
        _, _, ei, ev = jax.tree.map(np.asarray, run(boxes, scores, levels))
    assert (ov == ev).all()
    assert (oi[ov] == ei[ev]).all()


def test_nms_padded_max_out_exceeds_candidates():
    """Fewer candidates than max_out (a 768px BiFPN pyramid has ~1k
    anchors vs POST_NMS_TOPK_TRAIN=2000): clamp + pad with invalids
    instead of a top_k ValueError."""
    import jax.numpy as jnp
    import numpy as np
    from afigan_tpu.ops.nms import nms_padded

    rng = np.random.RandomState(0)
    n = 7
    xy = rng.rand(n, 2) * 50
    boxes = jnp.asarray(np.concatenate([xy, xy + 10 + rng.rand(n, 2) * 20], 1),
                        jnp.float32)
    scores = jnp.asarray(rng.rand(n), jnp.float32)
    ob, osc, oi, ov = nms_padded(boxes, scores, 0.5, max_out=32)
    assert ob.shape == (32, 4) and osc.shape == (32,) and ov.shape == (32,)
    k = int(np.asarray(ov).sum())
    assert 1 <= k <= n
    assert not np.asarray(ov)[n:].any()  # padding is invalid


def test_nms_block_size_invariance():
    """The blocked-sequential algorithm computes EXACT greedy NMS for
    any block size (the block is a scheduling choice, not an
    approximation) — the keep set must be identical across sizes."""
    import numpy as np
    import jax.numpy as jnp

    from afigan_tpu.ops.nms import nms_padded

    rng = np.random.RandomState(7)
    n = 700
    xy = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 120 + 4
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.1)

    ref = None
    for bs in (64, 128, 256, 512):
        b, s, i, v = nms_padded(boxes, scores, 0.5, 100, valid=valid,
                                block_size=bs)
        cur = (np.asarray(i)[np.asarray(v)], np.asarray(b)[np.asarray(v)])
        if ref is None:
            ref = cur
        else:
            np.testing.assert_array_equal(cur[0], ref[0], f"bs={bs}")
            np.testing.assert_allclose(cur[1], ref[1], err_msg=f"bs={bs}")

"""Fixed-shape non-maximum suppression — pure XLA, blocked-sequential.

TPU-native replacement for torchvision's CUDA ``nms``/``batched_nms``
(SURVEY §2.3), which the reference uses for RPN proposal filtering and
final detection filtering. Everything is static-shape: inputs are padded
score/box arrays with a validity mask; the output is the top-``max_out``
surviving entries plus a validity mask (no dynamic sizes anywhere).

Algorithm: sort by score, then process in blocks of 128 — inside a block
suppression is resolved with a short sequential scan; a surviving block
then suppresses all later boxes in one vectorized (B x N) step. This keeps
the sequential chain at ~N/B * B_inner tiny steps while all heavy IoU work
runs as wide VPU ops.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_NEG_INF = -1.0e10

# Suppression block size. 128 was the original hand-pick; the r5 on-chip
# A/B through the FULL BENCH_STAGE=infer program (not a micro-probe)
# measures alternatives via this env override — see
# benchmarks/results/nms_block_ab_r05.jsonl and the default note below.
_BLOCK_SIZE = int(os.environ.get("AFIGAN_NMS_BLOCK", "128"))


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    block_size: int = _BLOCK_SIZE,
    stop_after: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run NMS over score-sorted boxes.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,).
        valid: optional (N,) bool; invalid entries can never be kept.
        stop_after: early termination — stop processing blocks once this
            many boxes are kept. Keep decisions have a PREFIX property
            (later blocks never suppress earlier ones), so the identity
            of the top-``stop_after`` survivors is exact; tail entries of
            the returned mask are then unresolved (left at ``valid``) and
            callers must only consume the top ``stop_after`` kept. 0 =
            process everything (fully exact mask).

    Returns:
        order: (N,) int32 indices sorting scores descending (invalid last).
        keep_sorted: (N,) bool keep decisions aligned with ``order``.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-s).astype(jnp.int32)
    boxes_s = boxes[order]
    valid_s = valid[order]

    # NO padding of boxes_s/valid_s here. An earlier formulation padded the
    # sorted arrays up to a block multiple with a concatenate; under vmap,
    # XLA's while-loop-invariant-code-motion pass miscompiles that program
    # (the hoisted pad-concat interacts badly with the early-exit while
    # loop: deterministically wrong keep masks on CPU and TPU, jax 0.9.0).
    # Instead the last block's start is clamped to n - block_size so it
    # overlaps the previous block. Re-processing resolved entries is exact:
    # greedy-NMS survivors are mutually non-suppressing, so the fixpoint
    # leaves their decisions unchanged (idempotent), and freshly covered
    # tail entries see every earlier keeper's suppression already applied
    # to ``keep`` by the vectorized step.
    block_size = min(block_size, n)
    nb = -(-n // block_size)

    def block_step(k, keep):
        start = jnp.minimum(k * block_size, n - block_size)
        blk_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (block_size, 4))
        blk_keep = jax.lax.dynamic_slice(keep, (start,), (block_size,))

        # one (B, Npad) IoU per block; the intra-block matrix is its
        # [start : start+B] column slice (no second pairwise_iou)
        iou_bn = pairwise_iou(blk_boxes, boxes_s)  # (B, Npad)

        # --- resolve suppression inside the block: self-suppression
        # fixpoint (TF non_max_suppression_padded style). Iterating
        # k[i] <- valid[i] & ~∃j (k[j] & S[j,i]) stabilizes a growing
        # prefix each sweep → converges to the exact greedy result in
        # ≤ chain-depth iterations (typically 2-4) instead of B
        # sequential element steps.
        iou_bb = jax.lax.dynamic_slice(
            iou_bn, (0, start), (block_size, block_size)
        )
        col = jnp.arange(block_size)
        supp_mat = (iou_bb > iou_threshold) & (col[None, :] > col[:, None])

        def cond(state):
            _, changed = state
            return changed

        def body(state):
            kb, _ = state
            suppressed = jnp.any(kb[:, None] & supp_mat, axis=0)
            kb_new = blk_keep & ~suppressed
            return kb_new, jnp.any(kb_new != kb)

        blk_keep, _ = jax.lax.while_loop(cond, body, (blk_keep, jnp.bool_(True)))
        keep = jax.lax.dynamic_update_slice(keep, blk_keep, (start,))

        # --- suppress all later boxes in one vectorized shot ---
        later = jnp.arange(boxes_s.shape[0]) >= (start + block_size)
        suppressed_later = jnp.any(
            blk_keep[:, None] & (iou_bn > iou_threshold), axis=0
        ) & later
        # Early-exit accounting must not double-count the overlap the
        # clamped last block re-reads: only entries at global position
        # >= k*block_size are newly resolved by this block.
        fresh = (start + col) >= k * block_size
        blk_cnt = jnp.sum((blk_keep & fresh).astype(jnp.int32))
        return keep & ~suppressed_later, blk_cnt

    if stop_after <= 0:
        keep = jax.lax.fori_loop(
            0, nb, lambda k, kp: block_step(k, kp)[0], valid_s
        )
    else:
        # Early termination: a processed block's keep decisions are FINAL
        # (suppression only flows forward), so once >= stop_after boxes
        # are kept the top-stop_after survivors cannot change — skip the
        # remaining blocks. For RPN-sized inputs (10k candidates -> 1000
        # proposals) this typically halves the sequential block chain.
        def loop_cond(state):
            k, _, kept_cnt = state
            return (k < nb) & (kept_cnt < stop_after)

        def loop_body(state):
            k, keep, kept_cnt = state
            keep, blk_cnt = block_step(k, keep)
            return k + 1, keep, kept_cnt + blk_cnt

        _, keep, _ = jax.lax.while_loop(
            loop_cond, loop_body, (jnp.int32(0), valid_s, jnp.int32(0))
        )
    return order, keep[:n]


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    block_size: int = _BLOCK_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS returning the top-``max_out`` survivors (fixed shape).

    Returns:
        out_boxes: (max_out, 4); out_scores: (max_out,);
        out_idx: (max_out,) original indices; out_valid: (max_out,) bool.
    """
    order, keep_sorted = nms_keep_mask(
        boxes, scores, iou_threshold, valid,
        block_size=block_size, stop_after=max_out
    )
    # Fewer candidates than requested survivors (small canvases / sparse
    # pyramids — e.g. a 768px BiFPN gives ~1k anchors vs POST_NMS 2000):
    # take what exists and pad the fixed-shape outputs with invalids.
    n = keep_sorted.shape[-1]
    k = min(max_out, n)
    # Compact survivors to the front, preserving score order (top_k on the
    # keep mask is stable: ties broken by lowest index = highest score).
    # (stop_after=max_out: only the top-max_out kept entries are consumed
    # below, exactly the prefix the early-terminated mask guarantees.)
    _, sel = jax.lax.top_k(keep_sorted.astype(jnp.int32), k)
    out_valid = keep_sorted[sel]
    orig_idx = order[sel]
    out_boxes = boxes[orig_idx]
    out_scores = jnp.where(out_valid, scores[orig_idx], _NEG_INF)
    if k < max_out:
        pad = max_out - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad), constant_values=_NEG_INF)
        orig_idx = jnp.pad(orig_idx, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    return out_boxes, out_scores, orig_idx.astype(jnp.int32), out_valid


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    block_size: int = _BLOCK_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (torchvision style).

    Boxes of different ``idxs`` (class or level ids) never suppress each
    other: each category's boxes are shifted to a disjoint coordinate range.
    """
    if boxes.shape[0] == 0:
        raise ValueError("batched_nms_padded requires non-empty input")
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    ob, osc, oi, ov = nms_padded(
        shifted, scores, iou_threshold, max_out, valid, block_size=block_size
    )
    # Return the un-shifted boxes.
    return boxes[oi], osc, oi, ov

"""Fixed-shape random minibatch sampling of anchors / proposals.

TPU-native redesign of d2 v0.1.1 ``subsample_labels`` (used for RPN's 256
anchors and ROI heads' 512 proposals per image): instead of returning
variable-length index tensors, we return a fixed-size index array plus a
validity mask. Random selection is done with ranking tricks (argsort of
random keys) — fully static shapes, jit/vmap friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _random_rank_within_mask(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element among masked elements, in uniformly random order.

    Masked-out elements receive ranks >= num_masked.
    """
    n = mask.shape[0]
    rand = jax.random.uniform(key, (n,))
    score = jnp.where(mask, rand, -1.0)
    order = jnp.argsort(-score)  # masked (score>0) first, random order
    ranks = jnp.zeros((n,), dtype=jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


def subsample_labels(
    key: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a fixed-size minibatch with at most ``positive_fraction`` positives.

    Args:
        labels: (N,) int; -1 = ignore, ``bg_label`` = background, else foreground.
        num_samples: static number of samples to return.
        positive_fraction: max fraction of positives in the sample.

    Returns:
        idx: (num_samples,) int32 indices into labels (arbitrary where invalid).
        valid: (num_samples,) bool; False rows must be ignored by the loss.

    Semantics match d2 subsample_labels: num_pos = min(#pos, pf*num_samples),
    num_neg = min(#neg, num_samples - num_pos), both chosen uniformly.
    """
    kp, kn = jax.random.split(key)
    pos_mask = (labels != -1) & (labels != bg_label)
    neg_mask = labels == bg_label

    num_pos_avail = jnp.sum(pos_mask.astype(jnp.int32))
    num_pos = jnp.minimum(num_pos_avail, int(num_samples * positive_fraction))
    num_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    num_neg = jnp.minimum(num_neg_avail, num_samples - num_pos)

    pos_rank = _random_rank_within_mask(kp, pos_mask)
    neg_rank = _random_rank_within_mask(kn, neg_mask)

    sel_pos = pos_mask & (pos_rank < num_pos)
    sel_neg = neg_mask & (neg_rank < num_neg)

    # Pack the selected indices into a fixed (num_samples,) array:
    # selection score 2 for pos, 1 for neg, 0 otherwise; top-k by score with
    # index tiebreak keeps all selected (num_pos + num_neg <= num_samples).
    score = sel_pos.astype(jnp.float32) * 2.0 + sel_neg.astype(jnp.float32)
    top_scores, idx = jax.lax.top_k(score, num_samples)
    valid = top_scores > 0
    return idx.astype(jnp.int32), valid

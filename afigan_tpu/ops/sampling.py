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

    Performance: selection uses top-k over random keys (k <= num_samples)
    instead of full argsorts — RPN calls this over ~270k anchors per image
    per step, and top_k(N, 256) is far cheaper than argsort(N) on TPU.
    """
    kp, kn = jax.random.split(key)
    pos_mask = (labels != -1) & (labels != bg_label)
    neg_mask = labels == bg_label
    # d2: num_pos = int(num_samples * positive_fraction) EXACTLY —
    # pf < 1/num_samples means zero positives. top_k still needs k >= 1,
    # so the floor applies only to k and the selection is gated by the
    # true cap.
    cap_pos = int(num_samples * positive_fraction)
    k_pos = max(cap_pos, 1)

    rp = jax.random.uniform(kp, labels.shape, minval=0.1, maxval=1.0)
    rn = jax.random.uniform(kn, labels.shape, minval=0.1, maxval=1.0)

    # top-cap random positives: entries with score>0 are uniformly-random
    # positives; count = min(#pos, cap_pos)
    pos_scores, pos_idx = jax.lax.top_k(jnp.where(pos_mask, rp, -1.0), k_pos)
    pos_sel = (pos_scores > 0) if cap_pos > 0 else jnp.zeros_like(
        pos_scores, dtype=bool
    )
    num_pos = jnp.sum(pos_sel.astype(jnp.int32))

    num_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    num_neg = jnp.minimum(num_neg_avail, num_samples - num_pos)
    neg_scores, neg_idx = jax.lax.top_k(jnp.where(neg_mask, rn, -1.0), num_samples)
    neg_sel = (neg_scores > 0) & (
        jnp.arange(num_samples, dtype=jnp.int32) < num_neg
    )

    # compact (cap_pos + num_samples) candidates into num_samples slots;
    # top_k on the selection score is stable (ties → lowest index first),
    # and num_pos + num_neg <= num_samples by construction.
    all_idx = jnp.concatenate([pos_idx, neg_idx]).astype(jnp.int32)
    score = jnp.concatenate(
        [pos_sel.astype(jnp.float32) * 2.0, neg_sel.astype(jnp.float32)]
    )
    top_scores, sel = jax.lax.top_k(score, num_samples)
    valid = top_scores > 0
    return all_idx[sel], valid

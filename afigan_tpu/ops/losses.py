"""Shared elementwise loss primitives.

One definition of the numerically-stable BCE-with-logits and d2
smooth-L1 — previously inlined (identically) in rpn, box_head,
mask_head, fcos, and stage1; a numerics tweak had to be replicated
in five places to stay consistent.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float) -> jnp.ndarray:
    """Elementwise d2 smooth_l1_loss: beta <= eps degrades to plain L1
    (fvcore semantics; d2 trains the RPN/box heads with beta 0.0)."""
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits, numerically stable:
    max(x, 0) - x*t + log(1 + exp(-|x|)) (torch BCEWithLogitsLoss)."""
    return (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )

"""PreciseBN — recompute BatchNorm statistics as true batch averages.

d2's hooks.PreciseBN (SURVEY §2.2 Hooks; enabled via TEST.PRECISE_BN):
before evaluation, run N training-mode forward passes and replace the
EMA running statistics with the uniform average of per-batch statistics.

flax's BatchNorm writes ``r_k = m·r_{k-1} + (1-m)·b_k``; we recover each
raw batch statistic by differencing ``b_k = (r_k - m·r_{k-1}) / (1-m)``
and average those — no changes to the module needed.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # must match models/layers.py get_norm


def compute_precise_bn_stats(
    forward_with_stats: Callable[[Any, Any], Any],
    init_stats: Any,
    batches: Iterable,
    num_iters: int,
) -> Any:
    """Args:
        forward_with_stats: (batch_stats, batch) -> new_batch_stats, i.e.
            a train-mode forward with mutable batch_stats.
        init_stats: current batch_stats pytree.
        batches: iterable of input batches.

    Returns: batch_stats pytree with mean/var replaced by true averages.
    """
    m = BN_MOMENTUM
    sums = jax.tree.map(jnp.zeros_like, init_stats)
    prev = init_stats
    n = 0
    for batch in batches:
        if n >= num_iters:
            break
        new = forward_with_stats(prev, batch)
        batch_stat = jax.tree.map(lambda r1, r0: (r1 - m * r0) / (1.0 - m), new, prev)
        sums = jax.tree.map(jnp.add, sums, batch_stat)
        prev = new
        n += 1
    if n == 0:
        return init_stats
    return jax.tree.map(lambda s: s / n, sums)

"""PreciseBN — recompute BatchNorm statistics as true batch averages.

d2's hooks.PreciseBN (SURVEY §2.2 Hooks; enabled via TEST.PRECISE_BN):
before evaluation, run N training-mode forward passes and replace the
EMA running statistics with the uniform average of per-batch statistics.

flax's BatchNorm writes ``r_k = m·r_{k-1} + (1-m)·b_k``; we recover each
raw batch statistic by differencing ``b_k = (r_k - m·r_{k-1}) / (1-m)``
and average those — no changes to the module needed.

The momentum ``m`` is ESTIMATED per stats leaf by calibration rather
than guessed from path names (the repo mixes 0.9 backbone BNs with 0.99
BiFPN BNs, and name heuristics silently corrupt recovered stats ~10x on
a mismatch): zero the stats and run the SAME batch twice —
``s1 = (1-m)·b`` and ``s2 = (1-m²)·b``, so ``m = s2/s1 - 1``
elementwise; the median over the leaf is exact for deterministic
statistics and robust for sampling-dependent ones (head BNs).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # models/layers.py get_norm default (fallback)


def estimate_momentum_per_leaf(forward_with_stats, init_stats, batch):
    """Per-leaf flax BN momentum via the two-forward calibration above.

    Returns (momentum_tree of python floats, s1, s2) where s1/s2 are the
    stats after the first/second calibration forward (s2 is a valid
    running-stats tree to continue from). Degenerate leaves (all-zero
    s1) fall back to BN_MOMENTUM.
    """
    zeros = jax.tree.map(jnp.zeros_like, init_stats)
    s1 = forward_with_stats(zeros, batch)
    s2 = forward_with_stats(s1, batch)

    def est(a, b):
        a = np.asarray(jax.device_get(a), np.float64)
        b = np.asarray(jax.device_get(b), np.float64)
        ok = np.abs(a) > 1e-12
        if not ok.any():
            return BN_MOMENTUM
        m = float(np.median(b[ok] / a[ok]) - 1.0)
        if not np.isfinite(m) or not (0.0 < m < 1.0):
            return BN_MOMENTUM
        return m

    return jax.tree.map(est, s1, s2), s1, s2


def compute_precise_bn_stats(
    forward_with_stats: Callable[[Any, Any], Any],
    init_stats: Any,
    batches: Iterable,
    num_iters: int,
    momentum_fn: Optional[Callable] = None,
) -> Any:
    """Args:
        forward_with_stats: (batch_stats, batch) -> new_batch_stats, i.e.
            a train-mode forward with mutable batch_stats.
        init_stats: current batch_stats pytree.
        batches: iterable of input batches.
        momentum_fn: optional path -> momentum override; when omitted the
            momentum is calibrated per leaf from the first batch (see
            module docstring).

    Returns: batch_stats pytree with mean/var replaced by true averages.
    """
    import itertools

    batches = iter(batches)
    sums = jax.tree.map(jnp.zeros_like, init_stats)
    n = 0

    if momentum_fn is not None:
        mom = None
        prev = init_stats

        def batch_stat_of(new, prev_):
            return jax.tree_util.tree_map_with_path(
                lambda path, r1, r0: (r1 - momentum_fn(path) * r0)
                / (1.0 - momentum_fn(path)),
                new, prev_,
            )
    else:
        try:
            first = next(batches)
        except StopIteration:
            return init_stats
        mom, s1, prev = estimate_momentum_per_leaf(
            forward_with_stats, init_stats, first
        )
        # the calibration's first pass started from zeros: s1 = (1-m)·b,
        # an exact batch statistic for the first batch — count it
        sums = jax.tree.map(lambda s, a, m: s + a / (1.0 - m), sums, s1, mom)
        n = 1

        def batch_stat_of(new, prev_):
            return jax.tree.map(
                lambda r1, r0, m: (r1 - m * r0) / (1.0 - m), new, prev_, mom
            )

    for batch in itertools.islice(batches, max(num_iters - n, 0)):
        new = forward_with_stats(prev, batch)
        sums = jax.tree.map(jnp.add, sums, batch_stat_of(new, prev))
        prev = new
        n += 1
    if n == 0:
        return init_stats
    return jax.tree.map(lambda s: s / n, sums)

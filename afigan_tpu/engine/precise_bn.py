"""PreciseBN — recompute BatchNorm statistics as true batch averages.

d2's hooks.PreciseBN (SURVEY §2.2 Hooks; enabled via TEST.PRECISE_BN):
before evaluation, run N training-mode forward passes and replace the
EMA running statistics with the uniform average of per-batch statistics.

flax's BatchNorm writes ``r_k = m·r_{k-1} + (1-m)·b_k``; we recover each
raw batch statistic by differencing ``b_k = (r_k - m·r_{k-1}) / (1-m)``
and average those — no changes to the module needed.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # models/layers.py get_norm default

# BiFPN BNs run at flax momentum 0.99 (torch 0.01, ref bifpn_sr.py); their
# param paths are distinguishable by module name.
_BIFPN_MARKERS = ("_bn", "layer")


def momentum_for_path(path) -> float:
    keys = "/".join(str(getattr(p, "key", p)) for p in path)
    if any(m in keys for m in _BIFPN_MARKERS):
        return 0.99
    return BN_MOMENTUM


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
        momentum_fn: path -> BN momentum (defaults to momentum_for_path,
            handling the backbone-0.9 / BiFPN-0.99 mix).

    Returns: batch_stats pytree with mean/var replaced by true averages.
    """
    momentum_fn = momentum_fn or momentum_for_path
    sums = jax.tree.map(jnp.zeros_like, init_stats)
    prev = init_stats
    n = 0
    for batch in batches:
        if n >= num_iters:
            break
        new = forward_with_stats(prev, batch)
        batch_stat = jax.tree_util.tree_map_with_path(
            lambda path, r1, r0: (r1 - momentum_fn(path) * r0)
            / (1.0 - momentum_fn(path)),
            new, prev,
        )
        sums = jax.tree.map(jnp.add, sums, batch_stat)
        prev = new
        n += 1
    if n == 0:
        return init_stats
    return jax.tree.map(lambda s: s / n, sums)

"""Solver: SGD + warmup multi-step LR, parameter freezing via masks.

d2-v0.1.1 parity (re-exported by the reference at stage1_trainer.py:22,
516-533): SGD with momentum 0.9, WarmupMultiStepLR (linear warmup factor
1/1000 over 1000 iters, gamma 0.1 at STEPS), per-key weight decay
(WEIGHT_DECAY / WEIGHT_DECAY_NORM / WEIGHT_DECAY_BIAS, BIAS_LR_FACTOR),
optional AdamW (SOLVER.OPTIMIZER for Swin configs), gradient clipping.

TPU redesign: a single optax chain per model; d2's requires_grad=False
freezing (BACKBONE.FREEZE_AT, AFI_FREEZE, FrozenBN buffers) becomes an
optax.masked zero-update over param-path predicates — the functional
equivalent, and the mask doubles as documentation of what is frozen.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> optax.Schedule:
    """d2 WarmupMultiStepLR."""

    steps = tuple(int(s) for s in steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "linear":
            alpha = count / max(warmup_iters, 1)
            wf = jnp.where(count < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        elif warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            raise ValueError(warmup_method)
        milestone_count = sum(jnp.where(count >= s, 1.0, 0.0) for s in steps)
        return base_lr * wf * (gamma**milestone_count)

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_trainable_mask(
    params,
    frozen_predicates: Sequence[Callable[[str], bool]] = (),
) -> Any:
    """Pytree of bools: False where any predicate matches the param path."""

    def fn(path, _):
        p = _path_str(path)
        return not any(pred(p) for pred in frozen_predicates)

    return jax.tree_util.tree_map_with_path(fn, params)


def frozen_bn_predicate(path: str) -> bool:
    """FrozenBatchNorm params are buffers (d2: requires_grad=False).

    Path-only form catches the mean/var leaves; the scale/bias leaves of
    FrozenBN are indistinguishable from trainable BN/GN by path alone,
    so ``build_optimizer`` additionally freezes every sibling of a
    params-collection ``mean`` leaf (only FrozenBN keeps its statistics
    in params — live BN stats live in batch_stats)."""
    return "FrozenBatchNorm" in path or (
        path.endswith(("/mean", "/var")) and "norm" in path.lower()
    )


def _frozen_bn_prefixes(params) -> frozenset:
    """Module prefixes of FrozenBatchNorm instances: exactly the params
    subtrees that carry a ``mean`` leaf (live-BN means are in the
    batch_stats collection, never in params)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return frozenset(
        _path_str(path).rsplit("/", 1)[0]
        for path, _ in flat
        if _path_str(path).endswith("/mean")
    )


def _is_norm_param(ps: str) -> bool:
    """d2 classifies by module type (BN/SyncBN/FrozenBN/GN/LN); our norm
    modules are consistently named norm / norm1 / norm2 / patch_norm /
    norm_p3... (Swin) or <level>_bn (BiFPN), so the parent name decides."""
    if not ps.endswith(("/bias", "/scale", "/mean", "/var")):
        return False
    parts = ps.split("/")
    parent = parts[-2] if len(parts) >= 2 else ""
    return parent.startswith(("norm", "patch_norm")) or parent.endswith("_bn")


def backbone_freeze_predicate(freeze_at: int) -> Callable[[str], bool]:
    """d2 BACKBONE.FREEZE_AT: 1 freezes stem, 2 also freezes res2, ..."""

    def pred(path: str) -> bool:
        if freeze_at >= 1 and "/stem/" in path:
            return True
        for stage in range(2, 6):
            if freeze_at >= stage and f"/res{stage}/" in path:
                return True
        return False

    return pred


def afi_freeze_predicate(path: str) -> bool:
    """MODEL.AFI_FREEZE (ref fpn_sr.py:67-69): freeze the srf_module."""
    return "srf_module" in path


def build_optimizer(
    cfg,
    params,
    frozen_predicates: Sequence[Callable[[str], bool]] = (),
    base_lr: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """SOLVER.* → optax transform (+ the LR schedule for logging)."""
    s = cfg.SOLVER
    lr = base_lr if base_lr is not None else s.BASE_LR
    schedule = warmup_multistep_schedule(
        lr, s.STEPS, s.GAMMA, s.WARMUP_FACTOR, s.WARMUP_ITERS, s.WARMUP_METHOD
    )

    chain = []
    if s.CLIP_GRADIENTS.ENABLED:
        if s.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(s.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE))

    # weight decay masks: norms get WEIGHT_DECAY_NORM, biases WEIGHT_DECAY_BIAS
    def is_norm_or_bias_param(path: str) -> bool:
        return path.endswith(("/bias", "/scale", "/mean", "/var"))

    if s.OPTIMIZER.upper() == "ADAMW":
        def wd_mask(p):
            # Swin detection convention: no decay for norm params, biases,
            # the relative position bias tables, or the absolute pos embed
            def keep(path, _):
                ps = _path_str(path)
                if "relative_position_bias_table" in ps or "absolute_pos_embed" in ps:
                    return False
                return not is_norm_or_bias_param(ps)

            return jax.tree_util.tree_map_with_path(keep, p)

        chain.append(
            optax.adamw(
                learning_rate=schedule, b1=0.9, b2=0.999,
                weight_decay=s.WEIGHT_DECAY, mask=wd_mask,
            )
        )
    else:
        # SGD: decoupled per-group weight decay then momentum
        wd = s.WEIGHT_DECAY
        wd_bias = s.WEIGHT_DECAY_BIAS
        wd_norm = s.WEIGHT_DECAY_NORM

        def add_decay(grads, state, p):
            del state

            def fn(path, g, param):
                ps = _path_str(path)
                # d2 build_optimizer checks NORM MODULE membership before
                # the bias name: a GN/BN/LN bias gets WEIGHT_DECAY_NORM,
                # never WEIGHT_DECAY_BIAS
                if _is_norm_param(ps):
                    d = wd_norm
                elif ps.endswith("/bias"):
                    d = wd_bias
                else:
                    d = wd
                return g + d * param

            return jax.tree_util.tree_map_with_path(fn, grads, p), None

        chain.append(
            optax.GradientTransformation(lambda p: None, add_decay)
        )
        chain.append(optax.sgd(learning_rate=schedule, momentum=s.MOMENTUM))

    # d2 per-group bias LR: bias params step with BASE_LR * BIAS_LR_FACTOR.
    # Scaling the *updates* post-optimizer is exactly torch's per-group lr
    # (momentum/Adam state accumulates unscaled grads, lr applies at the step).
    if s.BIAS_LR_FACTOR != 1.0:
        factor = float(s.BIAS_LR_FACTOR)

        def scale_bias_updates(updates, state, params=None):
            del state, params

            def fn(path, u):
                ps = _path_str(path)
                # d2: only NON-norm biases get the bias LR group
                return u * factor if (
                    ps.endswith("/bias") and not _is_norm_param(ps)
                ) else u

            return jax.tree_util.tree_map_with_path(fn, updates), None

        chain.append(optax.GradientTransformation(lambda p: None, scale_bias_updates))

    tx = optax.chain(*chain)

    # FrozenBatchNorm affine params are d2 buffers and must NEVER train,
    # regardless of config: the norm module is named plain "norm" so the
    # path predicates can't see it — detect it structurally (a params
    # subtree with a "mean" leaf is FrozenBN; live BN stats live in
    # batch_stats) and freeze all four leaves.
    bn_prefixes = _frozen_bn_prefixes(params)
    preds = list(frozen_predicates)
    if bn_prefixes:
        preds.append(lambda p: p.rsplit("/", 1)[0] in bn_prefixes)

    if preds:
        mask = make_trainable_mask(params, preds)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "frozen", mask),
        )
    return tx, schedule

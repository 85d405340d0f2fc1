"""Stage 3 — target-detector fine-tune (plain detector loop).

Parity with the reference Target_Detector_Trainer
(ref: afigan/engine/stage3_trainer.py + d2 SimpleTrainer.run_step): plain
detector training with the pre-trained AF interpolator transplanted into
the FPN; the srf_module is frozen iff MODEL.AFI_FREEZE (ref
fpn_sr.py:67-69). No discriminator exists in stage 3 (ref quirk Q2:
build_hooks references a phantom D_model — not reproduced).

ONE jit program, shard_map data parallel, psum-averaged grads.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import build_model
from .stage1 import _det_rngs
from ..models.roi_heads import GroundTruth
from .solver import (
    afi_freeze_predicate,
    backbone_freeze_predicate,
    build_optimizer,
    frozen_bn_predicate,
)


class Stage3State(NamedTuple):
    params: Any
    stats: Any
    opt: Any
    step: jnp.ndarray


def _frozen_predicates(cfg):
    preds = [frozen_bn_predicate]
    if cfg.MODEL.BACKBONE.FREEZE_AT > 0:
        preds.append(backbone_freeze_predicate(cfg.MODEL.BACKBONE.FREEZE_AT))
    if cfg.MODEL.AFI_FREEZE:
        preds.append(afi_freeze_predicate)
    return preds


def init_stage3_state(cfg, rng, sample_hw=(128, 128), max_gt=8) -> Stage3State:
    det = build_model(cfg, train=True)
    h, w = sample_hw
    kp, ks = jax.random.split(rng)
    gt = GroundTruth(
        boxes=jnp.zeros((1, max_gt, 4)),
        classes=jnp.zeros((1, max_gt), jnp.int32),
        valid=jnp.zeros((1, max_gt), bool),
        masks=jnp.zeros((1, max_gt, 28, 28)) if cfg.MODEL.MASK_ON else None,
        keypoints=(
            jnp.zeros((1, max_gt, cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS, 3))
            if cfg.MODEL.KEYPOINT_ON else None
        ),
    )
    kd = jax.random.fold_in(ks, 1)
    variables = det.init(
        {"params": kp, "sampling": ks, "dropout": kd},
        jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32), gt,
    )
    tx, _ = build_optimizer(cfg, variables["params"], _frozen_predicates(cfg))
    return Stage3State(
        params=variables["params"],
        stats=variables.get("batch_stats", {}),
        opt=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_stage3_train_step(cfg, mesh: Optional[Mesh] = None):
    axis = "data" if mesh is not None else None
    det = build_model(cfg, train=True, axis_name=axis)
    accum = max(1, int(cfg.TPU.GRAD_ACCUM))

    def step_fn(state: Stage3State, batch, rng):
        tx, _ = build_optimizer(cfg, state.params, _frozen_predicates(cfg))

        def loss_fn(params, stats, mb, mb_rng):
            if stats:
                losses, mutated = det.apply(
                    {"params": params, "batch_stats": stats},
                    mb["image"], mb["image_sizes"], mb["gt"],
                    rngs=_det_rngs(mb_rng), mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                losses = det.apply(
                    {"params": params}, mb["image"], mb["image_sizes"],
                    mb["gt"], rngs=_det_rngs(mb_rng),
                )
                new_stats = stats
            # "diag_*" entries are monitoring-only (e.g. sampled-fg
            # fraction): reported in metrics, excluded from the loss
            total = sum(v for k, v in losses.items()
                        if not k.startswith("diag_"))
            return total, (losses, new_stats)

        if accum == 1:
            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.stats, batch, rng)
        else:
            # Microbatch accumulation (TPU.GRAD_ACCUM): scan over `accum`
            # slices of the per-device batch, averaging grads/metrics —
            # the same mean-of-per-shard-means the shard_map DP path
            # computes, so numerics are the blessed DP numerics. BN
            # batch_stats (when present) update sequentially through the
            # carry, i.e. small-batch sequential semantics.
            mbs = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                g_acc, t_acc, l_acc, stats = carry
                mb, r = xs
                (t, (ls, stats)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, stats, mb, r)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                l_acc = jax.tree.map(jnp.add, l_acc, ls)
                return (g_acc, t_acc + t, l_acc, stats), None

            # Seed the loss-dict structure from an abstract trace (no
            # compile, no execution) so the model body is compiled ONCE,
            # inside the scan.
            l_shape = jax.eval_shape(
                lambda p, s, mb, r: loss_fn(p, s, mb, r)[1][0],
                state.params, state.stats,
                jax.tree.map(lambda x: x[0], mbs), rngs[0],
            )
            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            zero_l = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), l_shape)
            (grads, total, losses, new_stats), _ = jax.lax.scan(
                body, (zero_g, jnp.zeros(()), zero_l, state.stats), (mbs, rngs),
            )
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            total = total * inv
            losses = jax.tree.map(lambda v: v * inv, losses)
        if axis:
            grads = jax.lax.pmean(grads, axis)
        updates, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {"total_loss": total, **losses}
        if axis:
            metrics = jax.lax.pmean(metrics, axis)
        return Stage3State(new_params, new_stats, new_opt, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep, dat = P(), P("data")
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(rep, dat, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))

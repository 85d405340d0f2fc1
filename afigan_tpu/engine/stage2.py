"""Stage 2 — Multi-scale AF-extractor training (detector + GAN), one step.

Loss math parity with the reference run_step
(ref: afigan/engine/stage2_trainer.py:279-384):
  * detector (GeneralizedRCNN_AFExtractor) trains on half-res images with
    detection losses vs half-res GT and returns its pyramid features
  * "real" = guide full-res features bilinearly downsampled x0.5 (:302);
    "fake" = the extractor's pyramid (whose top-down path runs the AFI
    generator)
  * D step first: Σ_lvl BCE(D(real),1) + BCE(D(stopgrad(fake)),0)
  * G step: det losses + Σ_lvl 1e-3·adv + L1(fake, real), single backward
    through detector+srf (:344-384). Ref quirk Q3 (adv detached → dead
    term) is fixed: adversarial gradient flows into the features through
    the UPDATED discriminator.

TPU design: ONE jit program; the detector forward runs once — we take
``jax.vjp`` of (losses, features) w.r.t. detector params, update D using
stop-gradded features, then pull detector gradients through the saved vjp
with cotangents (1 for each det loss, d(GAN)/d(features) for the pyramid).
This avoids the second detector forward a naive two-phase port would pay.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import PatchDiscriminator, build_guide_model, build_model
from ..models.roi_heads import GroundTruth
from .solver import (
    afi_freeze_predicate,
    backbone_freeze_predicate,
    build_optimizer,
    frozen_bn_predicate,
)
from .stage1 import _bce_mean, _crop_pair, _det_rngs


def gan_levels(cfg) -> tuple:
    """Pyramid levels the stage-2 GAN couples (shared by extractor and
    guide). The reference always pairs the RCNN-family p2-p6 (its stage-2
    only ever ran FPN extractors, ref stage2_trainer.py:300-303); BiFPN
    pyramids and p6p7-top-block FPNs (e.g. BASELINE config #3: FCOS
    R-50-BiFPN) produce p3-p7, so the coupled set is the intersection of
    the extractor's and the guide's pyramids."""
    smap = {"res2": 2, "res3": 3, "res4": 4, "res5": 5,
            "stage2": 2, "stage3": 3, "stage4": 4, "stage5": 5}

    def levels_of(name: str) -> tuple:
        if "bifpn" in name:
            return ("p3", "p4", "p5", "p6", "p7")
        unknown = [f for f in cfg.MODEL.FPN.IN_FEATURES if f not in smap]
        if unknown:
            raise ValueError(
                f"stage-2 GAN coupling: unknown FPN.IN_FEATURES {unknown} "
                f"(known: {sorted(smap)}) — extend engine/stage2.py::"
                f"gan_levels for this backbone family")
        out = [f"p{smap[f]}" for f in cfg.MODEL.FPN.IN_FEATURES]
        tb = cfg.MODEL.FPN.TOP_BLOCK
        if tb == "p6p7":
            out += ["p6", "p7"]
        elif tb == "maxpool":
            out += ["p6"]
        elif tb != "":  # fpn.py's contract: "maxpool" | "p6p7" | ""
            raise ValueError(
                f"stage-2 GAN coupling: unknown FPN.TOP_BLOCK {tb!r} "
                f"(known: '', 'maxpool', 'p6p7')")
        return tuple(out)

    det = levels_of(cfg.MODEL.BACKBONE.NAME)
    guide = levels_of(cfg.MODEL.GUIDE_BACKBONE.NAME or "")
    return tuple(l for l in det if l in guide)

Dtype = Any


class Stage2State(NamedTuple):
    det_params: Any
    det_stats: Any
    det_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    step: jnp.ndarray


def make_stage2_models(cfg, axis_name: Optional[str] = None):
    det = build_model(cfg, train=True, axis_name=axis_name, return_features=True)
    disc = PatchDiscriminator(
        in_channels=cfg.MODEL.AFI.IN_CHANNELS, train=True,
        axis_name=axis_name,  # SyncBN across shards, like stage 1
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
    )
    guide = build_guide_model(cfg)
    return det, disc, guide


def _det_frozen_predicates(cfg):
    preds = [frozen_bn_predicate]
    if cfg.MODEL.BACKBONE.FREEZE_AT > 0:
        preds.append(backbone_freeze_predicate(cfg.MODEL.BACKBONE.FREEZE_AT))
    if cfg.MODEL.AFI_FREEZE:
        preds.append(afi_freeze_predicate)
    return preds


def init_stage2_state(cfg, rng, sample_hw=(128, 128), max_gt=8) -> Tuple[Stage2State, Any]:
    det, disc, guide = make_stage2_models(cfg)
    h, w = sample_hw
    kd, kdd, kg, ks = jax.random.split(rng, 4)
    images = jnp.zeros((1, h, w, 3))
    sizes = jnp.asarray([[h, w]], jnp.int32)
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
    det_vars = det.init(
        {"params": kd, "sampling": ks, "dropout": jax.random.fold_in(ks, 1)},
        images, sizes, gt)
    d_vars = disc.init(kdd, jnp.zeros((1, h // 4, w // 4, cfg.MODEL.AFI.IN_CHANNELS)))
    guide_vars = guide.init(kg, jnp.zeros((1, 2 * h, 2 * w, 3)))

    det_tx, _ = build_optimizer(cfg, det_vars["params"], _det_frozen_predicates(cfg))
    d_tx, _ = build_optimizer(cfg, d_vars["params"])
    state = Stage2State(
        det_params=det_vars["params"],
        det_stats=det_vars.get("batch_stats", {}),
        det_opt=det_tx.init(det_vars["params"]),
        d_params=d_vars["params"],
        d_stats=d_vars.get("batch_stats", {}),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, guide_vars


def make_stage2_train_step(cfg, mesh: Optional[Mesh] = None):
    axis = "data" if mesh is not None else None
    det, disc, guide = make_stage2_models(cfg, axis_name=axis)
    adv_w = cfg.MODEL.AFI.ADV_LOSS_WEIGHT
    levels = gan_levels(cfg)

    def build_txs(det_params, d_params):
        dtx, _ = build_optimizer(cfg, det_params, _det_frozen_predicates(cfg))
        ddx, _ = build_optimizer(cfg, d_params)
        return dtx, ddx

    def apply_disc(params, stats, x):
        out, mut = disc.apply(
            {"params": params, "batch_stats": stats}, x, mutable=["batch_stats"]
        )
        return out, mut["batch_stats"]

    def step_fn(state: Stage2State, guide_vars, batch, rng):
        dtx, ddx = build_txs(state.det_params, state.d_params)

        hr_feats = guide.apply(guide_vars, batch["image"])
        real = []
        for l in levels:
            f = jax.lax.stop_gradient(hr_feats[l]).astype(jnp.float32)
            b, h, w, c = f.shape
            real.append(jax.image.resize(f, (b, h // 2, w // 2, c), "linear"))

        gt = batch["gt"]

        # --- detector forward once, with vjp for later gradient pull ---
        # BN/SyncBN detectors (e.g. Base-Cascade-SyncBN configs) need
        # mutable batch_stats (mirrors stage3's pattern); the mutated stats
        # ride along as vjp aux so the single-forward design is kept.
        def det_forward(params):
            if state.det_stats:
                out, mutated = det.apply(
                    {"params": params, "batch_stats": state.det_stats},
                    batch["image_x0.5"], batch["image_sizes_x0.5"], gt,
                    rngs=_det_rngs(rng), mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                out = det.apply(
                    {"params": params}, batch["image_x0.5"],
                    batch["image_sizes_x0.5"], gt, rngs=_det_rngs(rng),
                )
                new_stats = state.det_stats
            losses, feats = out
            feat_list = [feats[l].astype(jnp.float32) for l in levels]
            return (losses, feat_list), new_stats

        ((det_losses, fake), det_vjp, new_det_stats) = jax.vjp(
            det_forward, state.det_params, has_aux=True
        )

        # ---------------- D step ----------------
        def d_loss_fn(d_params, d_stats):
            total = 0.0
            stats = d_stats
            metrics = {}
            for name, rf, ff in zip(levels, real, fake):
                ff = jax.lax.stop_gradient(ff)
                rf, ff = _crop_pair(rf, ff)
                logit_real, stats = apply_disc(d_params, stats, rf)
                logit_fake, stats = apply_disc(d_params, stats, ff)
                lvl = _bce_mean(logit_real, 1.0) + _bce_mean(logit_fake, 0.0)
                metrics[f"d_loss_{name}"] = lvl
                total = total + lvl
            return total, (stats, metrics)

        (d_loss, (new_d_stats, d_metrics)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_stats)
        if axis:
            d_grads = jax.lax.pmean(d_grads, axis)
        d_up, new_d_opt = ddx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_up)

        # ---------------- G step: det losses + GAN on features ----------------
        def gan_feat_loss(fake_list):
            total = 0.0
            stats = new_d_stats
            metrics = {}
            for name, rf, ff in zip(levels, real, fake_list):
                rf, ff = _crop_pair(rf, ff)
                logit_fake, stats = apply_disc(new_d_params, stats, ff)
                adv = _bce_mean(logit_fake, 1.0)
                content = jnp.mean(jnp.abs(ff - rf))
                metrics[f"adv_loss_{name}"] = adv
                metrics[f"content_loss_{name}"] = content
                total = total + adv_w * adv + content
            return total, (stats, metrics)

        (gan_loss, (final_d_stats, g_metrics)), feat_cotangents = jax.value_and_grad(
            gan_feat_loss, has_aux=True
        )(fake)

        # "diag_*" entries are monitoring-only: zero cotangent (no loss
        # contribution) and excluded from total_loss below
        loss_cotangents = {
            k: (jnp.zeros_like(v) if k.startswith("diag_")
                else jnp.ones_like(v))
            for k, v in det_losses.items()
        }
        (det_grads,) = det_vjp((loss_cotangents, feat_cotangents))
        if axis:
            det_grads = jax.lax.pmean(det_grads, axis)
        det_up, new_det_opt = dtx.update(det_grads, state.det_opt, state.det_params)
        new_det_params = optax.apply_updates(state.det_params, det_up)

        total_loss = sum(v for k, v in det_losses.items()
                         if not k.startswith("diag_")) + gan_loss
        metrics = {
            "total_loss": total_loss, "d_loss": d_loss,
            **det_losses,
            **d_metrics, **g_metrics,
        }
        if axis:
            metrics = jax.lax.pmean(metrics, axis)

        new_state = Stage2State(
            det_params=new_det_params, det_stats=new_det_stats,
            det_opt=new_det_opt, d_params=new_d_params,
            d_stats=final_d_stats, d_opt=new_d_opt, step=state.step + 1,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep, dat = P(), P("data")
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(rep, rep, dat, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))

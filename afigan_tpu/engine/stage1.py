"""Stage 1 — AFI-GAN adversarial training, one fused jit train step.

Loss math parity with the reference run_step
(ref: afigan/engine/stage1_trainer.py:305-433):
  * guide (frozen) produces p2..p6 at full res (hr) and half res (lr)
  * D step: per level, tr = stopgrad(G(lr)); crop hr/tr to common size
    (:437-443); loss_D = Σ_lvl BCE(D(hr),1) + BCE(D(tr),0) (mean-reduced
    logits BCE); D optimizer steps FIRST.
  * G step (against the UPDATED D, same ordering as the reference):
    loss_G = Σ_lvl 1e-3·BCE(D(G(lr)),1) + L1(G(lr), hr).
    Ref quirk Q3 (D output detached → no adversarial gradient to G) is
    FIXED here: gradients flow G ← D(fake) as the paper intends; D's
    params are simply not differentiated.

TPU design: the whole D-step + G-step is ONE compiled program (the
BASELINE.json north star), data-parallel via shard_map over the `data`
mesh axis with psum-averaged grads (the DDP/NCCL equivalent). The
discriminator's BatchNorm batch stats are psum-synced by flax via
axis_name (SyncBN semantics).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.losses import bce_with_logits
from ..models import AFIGenerator, PatchDiscriminator, build_guide_model
from .solver import build_optimizer

LEVELS = ("p2", "p3", "p4", "p5", "p6")


def _det_rngs(rng):
    """Training-forward rng streams for the detector apply: "sampling"
    (RPN/ROI subsampling) plus "dropout" (Swin DropPath — stochastic
    depth needs its own stream; any backbone without dropout collections
    simply ignores it)."""
    import jax

    k1, k2 = jax.random.split(rng)
    return {"sampling": k1, "dropout": k2}


class Stage1State(NamedTuple):
    g_params: Any
    g_opt: Any
    d_params: Any
    d_stats: Any  # discriminator BatchNorm running stats
    d_opt: Any
    step: jnp.ndarray


def _bce_mean(logits, target_value):
    x = logits.astype(jnp.float32)
    return jnp.mean(bce_with_logits(x, jnp.full_like(x, target_value)))


def _crop_pair(a, b):
    """Crop both NHWC tensors to the common min H, W (ref :437-443)."""
    h = min(a.shape[1], b.shape[1])
    w = min(a.shape[2], b.shape[2])
    return a[:, :h, :w], b[:, :h, :w]


def make_stage1_models(cfg, train: bool = True, axis_name: Optional[str] = None):
    g = AFIGenerator(
        in_channels=cfg.MODEL.AFI.IN_CHANNELS,
        n_rdb=cfg.MODEL.AFI.N_RDB,
        growth_rate=cfg.MODEL.AFI.GROWTH_RATE,
        residual_scale=cfg.MODEL.AFI.RESIDUAL_SCALE,
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
    )
    d = PatchDiscriminator(
        in_channels=cfg.MODEL.AFI.IN_CHANNELS,
        train=train,
        axis_name=axis_name,
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
    )
    guide = build_guide_model(cfg)
    return g, d, guide


def init_stage1_state(cfg, rng, sample_hw=(64, 64), axis_name=None) -> Tuple[Stage1State, Any]:
    """Initialize G/D (+ optimizers). Returns (state, guide_variables)."""
    g, d, guide = make_stage1_models(cfg, train=True, axis_name=axis_name)
    c = cfg.MODEL.AFI.IN_CHANNELS
    h, w = sample_hw
    kg, kd, kguide = jax.random.split(rng, 3)
    fake_feat = jnp.zeros((1, h, w, c))
    g_vars = g.init(kg, fake_feat)
    d_vars = d.init(kd, fake_feat)
    guide_vars = guide.init(kguide, jnp.zeros((1, 4 * h, 4 * w, 3)))

    g_tx, _ = build_optimizer(cfg, g_vars["params"])
    d_tx, _ = build_optimizer(cfg, d_vars["params"])
    state = Stage1State(
        g_params=g_vars["params"],
        g_opt=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_stats=d_vars.get("batch_stats", {}),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, guide_vars


def make_stage1_train_step(cfg, mesh: Optional[Mesh] = None):
    """Build the fused D+G train step; shard_map'ped over `data` if mesh given."""
    axis = "data" if mesh is not None else None
    g, d, guide = make_stage1_models(cfg, train=True, axis_name=axis)
    adv_w = cfg.MODEL.AFI.ADV_LOSS_WEIGHT

    def build_txs(g_params, d_params):
        # built from the REAL param trees (like stage 2) so the
        # transforms agree with the optimizer state init_stage1_state
        # created — build_optimizer(cfg, None) would skip the structural
        # FrozenBN masking and diverge the optax state structure
        g_tx, _ = build_optimizer(cfg, g_params)
        d_tx, _ = build_optimizer(cfg, d_params)
        return g_tx, d_tx

    def apply_d(params, stats, x):
        out, mutated = d.apply(
            {"params": params, "batch_stats": stats}, x, mutable=["batch_stats"]
        )
        return out, mutated["batch_stats"]

    def step_fn(state: Stage1State, guide_vars, batch) -> Tuple[Stage1State, Dict]:
        g_tx, d_tx = build_txs(state.g_params, state.d_params)
        hr_feats = guide.apply(guide_vars, batch["image"])
        lr_feats = guide.apply(guide_vars, batch["image_x0.5"])
        hr = [jax.lax.stop_gradient(hr_feats[l]) for l in LEVELS]
        lr = [jax.lax.stop_gradient(lr_feats[l]) for l in LEVELS]

        # ---------------- D step ----------------
        def d_loss_fn(d_params, d_stats):
            total = 0.0
            metrics = {}
            stats = d_stats
            for name, lr_f, hr_f in zip(LEVELS, lr, hr):
                tr = jax.lax.stop_gradient(g.apply({"params": state.g_params}, lr_f))
                tr, hr_c = _crop_pair(tr, hr_f)
                logit_real, stats = apply_d(d_params, stats, hr_c)
                logit_fake, stats = apply_d(d_params, stats, tr)
                lvl_loss = _bce_mean(logit_real, 1.0) + _bce_mean(logit_fake, 0.0)
                metrics[f"d_loss_{name}"] = lvl_loss
                total = total + lvl_loss
            return total, (stats, metrics)

        (d_loss, (new_d_stats, d_metrics)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_stats)
        if axis:
            d_grads = jax.lax.pmean(d_grads, axis)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G step (vs updated D, ref ordering) ----------------
        def g_loss_fn(g_params):
            total = 0.0
            metrics = {}
            stats = new_d_stats
            for name, lr_f, hr_f in zip(LEVELS, lr, hr):
                tr = g.apply({"params": g_params}, lr_f)
                tr, hr_c = _crop_pair(tr, hr_f)
                logit_fake, stats = apply_d(new_d_params, stats, tr)
                adv = _bce_mean(logit_fake, 1.0)
                content = jnp.mean(
                    jnp.abs(tr.astype(jnp.float32) - hr_c.astype(jnp.float32))
                )
                metrics[f"adv_loss_{name}"] = adv
                metrics[f"content_loss_{name}"] = content
                total = total + adv_w * adv + content
            return total, (stats, metrics)

        (g_loss, (final_d_stats, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        if axis:
            g_grads = jax.lax.pmean(g_grads, axis)
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, **d_metrics, **g_metrics}
        if axis:
            metrics = jax.lax.pmean(metrics, axis)

        new_state = Stage1State(
            g_params=new_g_params, g_opt=new_g_opt,
            d_params=new_d_params, d_stats=final_d_stats, d_opt=new_d_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    # initialize optimizer transforms lazily inside; state replicated,
    # batch sharded over data.
    rep = P()
    dat = P("data")
    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(rep, rep, dat),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))

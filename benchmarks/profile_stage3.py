"""Attribute stage-3 train-step time to subsystems (round-3 perf work).

The stage-3 step runs at ~23% MXU utilization (2.79 TFLOP/img at ~16
img/s vs 197 bf16 TFLOP/s peak) — most wall time is NOT matmul. This
script times a ladder of ablated jit programs on the real chip to find
where it goes:

  full          — the production stage-3 train step
  fwd_only      — loss computation without value_and_grad (backward cost)
  no_mask       — MASK_ON=False (mask branch cost)
  rpn_only_loss — detector loss with ROI heads replaced by a cheap sum
                  (ROI-heads cost: sampling+pooling+box/mask heads)
  backbone_only — backbone+FPN with a scalar loss (RPN machinery cost:
                  head convs, top-k, NMS, anchor matching, sampling)

Run:   python benchmarks/profile_stage3.py            (all ladder steps)
       PROF_ONLY=full,no_mask python ...              (subset)
Timing is chained (each step feeds the next) — the only honest timing on
the axon backend (see verify skill).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import chained_timed

import numpy as np
import jax
import jax.numpy as jnp
import optax

from afigan_tpu.config import get_cfg
from afigan_tpu.engine.stage3 import init_stage3_state, make_stage3_train_step
from afigan_tpu.engine.solver import build_optimizer
from afigan_tpu.models import build_model
from afigan_tpu.models.roi_heads import GroundTruth

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
H, W = 800, 1344
MAX_GT = 64


def make_data():
    rng = np.random.RandomState(0)
    num_boxes = 12
    boxes = np.zeros((BATCH, MAX_GT, 4), np.float32)
    valid = np.zeros((BATCH, MAX_GT), bool)
    for i in range(BATCH):
        xy = rng.rand(num_boxes, 2) * [W - 100, H - 100]
        wh = rng.rand(num_boxes, 2) * 180 + 20
        boxes[i, :num_boxes] = np.concatenate([xy, xy + wh], 1)
        valid[i, :num_boxes] = True
    return {
        "image": jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32) * 255),
        "image_sizes": jnp.asarray([[H, W]] * BATCH, jnp.int32),
        "gt": GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(
                rng.randint(0, 80, size=(BATCH, MAX_GT)).astype(np.int32)
            ),
            valid=jnp.asarray(valid),
            masks=jnp.asarray(rng.rand(BATCH, MAX_GT, 28, 28).astype(np.float32)),
        ),
    }


def base_cfg():
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/step3_afigan_mask_rcnn_R_50_FPN_3x.yaml")
    cfg.MODEL.AFI_FREEZE = False
    if os.environ.get("POOLER"):
        cfg.TPU.POOLER_IMPL = os.environ["POOLER"]
    return cfg


def timed(name, fn, *args):
    """Chained timing via the shared helper; fn(state, *rest) ALWAYS
    returns (new_state, aux) and may donate its state arg, so the next
    call consumes out[0], never the original args[0]."""
    rest = args[1:]
    return chained_timed(
        name, lambda st: fn(st, *rest), args[0],
        state_of=lambda out: out[0], label_width=14,
        imgs_per_iter=BATCH,
    )


def main():
    only = os.environ.get("PROF_ONLY", "").split(",") if os.environ.get("PROF_ONLY") else None
    data = make_data()
    results = {}

    def want(name):
        return only is None or name in only

    cfg = base_cfg()

    if want("full"):
        state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(H, W),
                                  max_gt=MAX_GT)
        step = make_stage3_train_step(cfg)
        key = jax.random.PRNGKey(1)
        results["full"] = timed("full", lambda s, d: step(s, d, key), state, data)
        del state, step

    if want("pooler_fast"):
        cfgf = base_cfg()
        cfgf.TPU.POOLER_IMPL = "fast"
        state = init_stage3_state(cfgf, jax.random.PRNGKey(0), sample_hw=(H, W),
                                  max_gt=MAX_GT)
        step = make_stage3_train_step(cfgf)
        key = jax.random.PRNGKey(1)
        results["pooler_fast"] = timed("pooler_fast",
                                       lambda s, d: step(s, d, key), state, data)
        del state, step

    if want("pool_bwd_zero"):
        # Same full step, but the pallas pooler's dense-matmul adjoint is
        # replaced by a zero cotangent for the features — full - this
        # rung == the adjoint's true in-step cost (XLA DCEs the einsums).
        # `afigan_tpu.ops` re-exports a FUNCTION named roi_align that
        # shadows the submodule attribute `import ... as` resolves to;
        # go through sys.modules for the module object.
        import afigan_tpu.ops.roi_align  # noqa: F401

        ra = sys.modules["afigan_tpu.ops.roi_align"]

        def _zero_bwd(strides, output_size, sampling_ratio, aligned,
                      canonical_size, canonical_level, overflow_slots,
                      res, g):
            features, boxes = res
            return (tuple(jnp.zeros_like(f) for f in features),
                    jnp.zeros_like(boxes))

        ra.multilevel_roi_align_pallas.defvjp(ra._pallas_fwd, _zero_bwd)
        try:
            state = init_stage3_state(cfg, jax.random.PRNGKey(0),
                                      sample_hw=(H, W), max_gt=MAX_GT)
            step = make_stage3_train_step(cfg)
            key = jax.random.PRNGKey(1)
            results["pool_bwd_zero"] = timed(
                "pool_bwd_zero", lambda s, d: step(s, d, key), state, data)
            del state, step
        finally:
            ra.multilevel_roi_align_pallas.defvjp(ra._pallas_fwd, ra._pallas_bwd)

    if want("no_crop"):
        # Mask targets come from a zeros stub instead of the per-ROI
        # crop_and_resize gather — full - this rung == crop cost.
        import afigan_tpu.models.roi_heads as rh

        real_crop = rh.crop_and_resize_masks

        def _zero_crop(gt_masks, gt_boxes, rois, gt_idx, out_size):
            r = rois.shape[0]
            return jnp.zeros((r, out_size, out_size), jnp.float32)

        rh.crop_and_resize_masks = _zero_crop
        try:
            state = init_stage3_state(cfg, jax.random.PRNGKey(0),
                                      sample_hw=(H, W), max_gt=MAX_GT)
            step = make_stage3_train_step(cfg)
            key = jax.random.PRNGKey(1)
            results["no_crop"] = timed(
                "no_crop", lambda s, d: step(s, d, key), state, data)
            del state, step
        finally:
            rh.crop_and_resize_masks = real_crop

    if want("no_prop_sel"):
        # RPN proposal selection (per-level top-k + decode + clip +
        # batched NMS) replaced by a fixed slice of level-0 anchors:
        # full - this rung == the whole selection chain's cost.
        import afigan_tpu.models.rpn as rpn_mod
        import afigan_tpu.models.meta_arch as ma_mod

        real_gp = ma_mod.generate_proposals

        def _stub_gp(anchors_per_level, logits_per_level, deltas_per_level,
                     image_sizes, box2box, pre_nms_topk, post_nms_topk,
                     nms_thresh, min_size=0.0, approx_topk=False):
            b = logits_per_level[0].shape[0]
            k = post_nms_topk
            boxes = jnp.broadcast_to(anchors_per_level[0][:k], (b, k, 4))
            # keep a (stop-gradient) data dependence on the logits so the
            # RPN head itself isn't DCE'd out of the ablated program
            s0 = jax.lax.stop_gradient(
                logits_per_level[0].astype(jnp.float32)
            ).reshape(b, -1)[:, :k]
            return rpn_mod.RPNOutput(
                proposals=boxes + 0.0 * s0[..., None],
                scores=s0,
                valid=jnp.ones((b, k), dtype=bool),
            )

        ma_mod.generate_proposals = _stub_gp
        try:
            state = init_stage3_state(cfg, jax.random.PRNGKey(0),
                                      sample_hw=(H, W), max_gt=MAX_GT)
            step = make_stage3_train_step(cfg)
            key = jax.random.PRNGKey(1)
            results["no_prop_sel"] = timed(
                "no_prop_sel", lambda s, d: step(s, d, key), state, data)
            del state, step
        finally:
            ma_mod.generate_proposals = real_gp

    if want("box_adjoint_zero"):
        # MASK_ON=False AND zero pooler adjoint: (no_mask - this rung)
        # == the BOX pooler adjoint's cost alone.
        import afigan_tpu.ops.roi_align  # noqa: F401

        ra = sys.modules["afigan_tpu.ops.roi_align"]

        def _zero_bwd2(strides, output_size, sampling_ratio, aligned,
                       canonical_size, canonical_level, overflow_slots,
                       res, g):
            features, boxes = res
            return (tuple(jnp.zeros_like(f) for f in features),
                    jnp.zeros_like(boxes))

        ra.multilevel_roi_align_pallas.defvjp(ra._pallas_fwd, _zero_bwd2)
        try:
            cfgb = base_cfg()
            cfgb.MODEL.MASK_ON = False
            state = init_stage3_state(cfgb, jax.random.PRNGKey(0),
                                      sample_hw=(H, W), max_gt=MAX_GT)
            step = make_stage3_train_step(cfgb)
            key = jax.random.PRNGKey(1)
            results["box_adjoint_zero"] = timed(
                "box_adj_zero", lambda s, d: step(s, d, key), state, data)
            del state, step
        finally:
            ra.multilevel_roi_align_pallas.defvjp(ra._pallas_fwd, ra._pallas_bwd)

    if want("no_mask"):
        cfg2 = base_cfg()
        cfg2.MODEL.MASK_ON = False
        state = init_stage3_state(cfg2, jax.random.PRNGKey(0), sample_hw=(H, W),
                                  max_gt=MAX_GT)
        step = make_stage3_train_step(cfg2)
        key = jax.random.PRNGKey(1)
        d2 = dict(data)
        d2["gt"] = data["gt"]._replace(masks=None)
        results["no_mask"] = timed("no_mask", lambda s, d: step(s, d, key),
                                   state, d2)
        del state, step

    if want("fwd_only"):
        det = build_model(cfg, train=True)
        state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(H, W),
                                  max_gt=MAX_GT)
        key = jax.random.PRNGKey(1)

        params = state.params

        @jax.jit
        def fwd(image, d):
            # chained via the image (axon: independent calls overlap and
            # report impossible timings — each call must consume the
            # previous output)
            losses = det.apply({"params": params}, image, d["image_sizes"],
                               d["gt"], rngs={"sampling": key})
            loss = sum(jax.tree.leaves(losses))
            return image + loss * 0.0, loss

        results["fwd_only"] = timed("fwd_only", fwd, data["image"], data)
        del state

    if want("rpn_only"):
        # backbone + FPN/AFI + RPN head + anchor matching + proposal
        # NMS + RPN losses (the ProposalNetwork meta-arch), fwd only.
        # rpn_only - fwd_only_backbone ≈ RPN machinery; comparing against
        # fwd_only isolates the ROI-heads forward.
        cfg3 = base_cfg()
        cfg3.MODEL.META_ARCHITECTURE = "ProposalNetwork"
        det = build_model(cfg3, train=True)
        key = jax.random.PRNGKey(1)
        params = det.init(
            {"params": jax.random.PRNGKey(0), "sampling": key},
            data["image"][:1], data["image_sizes"][:1],
            jax.tree.map(lambda x: x[:1], data["gt"]),
        )["params"]

        @jax.jit
        def rpn_fwd(image, d):
            losses = det.apply({"params": params}, image, d["image_sizes"],
                               d["gt"], rngs={"sampling": key})
            loss = sum(jax.tree.leaves(losses))
            return image + loss * 0.0, loss

        results["rpn_only"] = timed("rpn_only", rpn_fwd, data["image"], data)

    if want("backbone_only"):
        det = build_model(cfg, train=True)
        state = init_stage3_state(cfg, jax.random.PRNGKey(0), sample_hw=(H, W),
                                  max_gt=MAX_GT)
        tx, _ = build_optimizer(cfg, state.params, [])
        opt = tx.init(state.params)
        backbone = det.backbone

        @jax.jit
        def bb_step(carry, d):
            params, opt_state = carry

            def loss_fn(p):
                feats = backbone.apply({"params": p["backbone"]}, d["image"])
                return sum(jnp.sum(f.astype(jnp.float32)) * 1e-9
                           for f in feats.values())

            g = jax.grad(loss_fn)(params)
            updates, new_opt = tx.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), 0

        results["backbone_only"] = timed(
            "backbone_only", lambda c, d: bb_step(c, d), (state.params, opt), data
        )
        del state

    if results.get("full") and results.get("pool_bwd_zero"):
        print(f"\npooler-adjoint share: "
              f"{(results['full'] - results['pool_bwd_zero']) / results['full']:.1%}")
    if results.get("full") and results.get("no_crop"):
        print(f"mask-crop share: "
              f"{(results['full'] - results['no_crop']) / results['full']:.1%}")
    if results.get("full") and results.get("fwd_only"):
        print(f"\nbackward share: "
              f"{(results['full'] - results['fwd_only']) / results['full']:.1%}")
    if results.get("full") and results.get("no_mask"):
        print(f"mask-branch share: "
              f"{(results['full'] - results['no_mask']) / results['full']:.1%}")
    if results.get("full") and results.get("backbone_only"):
        print(f"backbone(+opt) share: "
              f"{results['backbone_only'] / results['full']:.1%}")


if __name__ == "__main__":
    main()

"""Torch-golden parity tests for the full Mask R-CNN inference path.

Extends the torch-parity pattern of test_afi_generator.py to every layer
type of the detector (VERDICT round-1 task #1a): an independent torch-CPU
replica of d2 v0.1.1's ResNet-50 + FPN + RPN head + box/mask heads is run
from a random d2-NAMED state dict; the same state dict is mapped through
utils/converters.py into our flax modules. Feature maps and head outputs
must match to fp32 tolerance — this simultaneously proves the converter
on every layer type (conv OIHW->HWIO, FrozenBN folding, maxpool padding,
FPN top-down wiring, fc CHW->HWC flatten order, deconv IOHW layout).

Reference call path pinned: /root/reference/run_net.py:95-100 (load ->
Trainer.test), afigan/engine/checkpoint.py:127-198 (name matching),
detectron2 v0.1.1 GeneralizedRCNN inference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from afigan_tpu.config import get_cfg
from afigan_tpu.models.build import build_backbone
from afigan_tpu.models.box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from afigan_tpu.models.mask_head import MaskRCNNConvUpsampleHead
from afigan_tpu.models.rpn import RPNHead
from afigan_tpu.utils.converters import (
    merge_variables,
    state_dict_to_variables,
)

EPS = 1e-5  # FrozenBN eps (both sides)
R50_BLOCKS = (3, 4, 6, 3)


# ---------------------------------------------------------------------------
# Random d2-named state dict (kaiming-scaled so activations stay sane
# through ~50 layers)
# ---------------------------------------------------------------------------

def _conv_w(rng, o, i, k):
    std = (2.0 / (i * k * k)) ** 0.5
    return (rng.randn(o, i, k, k) * std).astype(np.float32)


def _lin_w(rng, o, i):
    std = (1.0 / i) ** 0.5
    return (rng.randn(o, i) * std).astype(np.float32)


def _add_frozen_bn(sd, rng, p, c):
    sd[p + ".norm.weight"] = (1.0 + 0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".norm.bias"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".norm.running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".norm.running_var"] = (1.0 + 0.5 * rng.rand(c)).astype(np.float32)


def make_resnet50_sd(rng, prefix="backbone.bottom_up."):
    sd = {}
    sd[prefix + "stem.conv1.weight"] = _conv_w(rng, 64, 3, 7)
    _add_frozen_bn(sd, rng, prefix + "stem.conv1", 64)
    in_c = 64
    out_c, mid_c = 256, 64
    for si, stage in enumerate(range(2, 6)):
        for b in range(R50_BLOCKS[si]):
            p = f"{prefix}res{stage}.{b}"
            sd[p + ".conv1.weight"] = _conv_w(rng, mid_c, in_c if b == 0 else out_c, 1)
            _add_frozen_bn(sd, rng, p + ".conv1", mid_c)
            sd[p + ".conv2.weight"] = _conv_w(rng, mid_c, mid_c, 3)
            _add_frozen_bn(sd, rng, p + ".conv2", mid_c)
            sd[p + ".conv3.weight"] = _conv_w(rng, out_c, mid_c, 1)
            _add_frozen_bn(sd, rng, p + ".conv3", out_c)
            if b == 0:
                sd[p + ".shortcut.weight"] = _conv_w(rng, out_c, in_c, 1)
                _add_frozen_bn(sd, rng, p + ".shortcut", out_c)
        in_c = out_c
        out_c, mid_c = out_c * 2, mid_c * 2
    return sd


def make_fpn_sd(rng):
    sd = {}
    in_ch = {2: 256, 3: 512, 4: 1024, 5: 2048}
    for s in (2, 3, 4, 5):
        sd[f"backbone.fpn_lateral{s}.weight"] = _conv_w(rng, 256, in_ch[s], 1)
        sd[f"backbone.fpn_lateral{s}.bias"] = (0.05 * rng.randn(256)).astype(np.float32)
        sd[f"backbone.fpn_output{s}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"backbone.fpn_output{s}.bias"] = (0.05 * rng.randn(256)).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# Torch replicas (functional, from the d2 v0.1.1 architecture)
# ---------------------------------------------------------------------------

def tt(a):
    return torch.from_numpy(np.asarray(a))


def _t_fbn(x, sd, p):
    w, b = tt(sd[p + ".norm.weight"]), tt(sd[p + ".norm.bias"])
    m, v = tt(sd[p + ".norm.running_mean"]), tt(sd[p + ".norm.running_var"])
    scale = w / torch.sqrt(v + EPS)
    return x * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]


def _t_convbn(x, sd, p, stride=1, pad=0, relu=False):
    x = F.conv2d(x, tt(sd[p + ".weight"]), None, stride, pad)
    x = _t_fbn(x, sd, p)
    return F.relu(x) if relu else x


def _t_bottleneck(x, sd, p, stride):
    # d2 MSRA convention: stride on the 1x1 (STRIDE_IN_1X1=True)
    out = _t_convbn(x, sd, p + ".conv1", stride=stride, relu=True)
    out = _t_convbn(out, sd, p + ".conv2", stride=1, pad=1, relu=True)
    out = _t_convbn(out, sd, p + ".conv3")
    if p + ".shortcut.weight" in sd:
        sc = _t_convbn(x, sd, p + ".shortcut", stride=stride)
    else:
        sc = x
    return F.relu(out + sc)


def torch_resnet50(x, sd, prefix="backbone.bottom_up."):
    y = _t_convbn(x, sd, prefix + "stem.conv1", stride=2, pad=3, relu=True)
    y = F.max_pool2d(y, 3, 2, 1)
    outs = {}
    for si, stage in enumerate(range(2, 6)):
        for b in range(R50_BLOCKS[si]):
            stride = 2 if (b == 0 and stage > 2) else 1
            y = _t_bottleneck(y, sd, f"{prefix}res{stage}.{b}", stride)
        outs[f"res{stage}"] = y
    return outs


def torch_fpn(feats, sd):
    def conv(x, p, pad=0):
        return F.conv2d(x, tt(sd[p + ".weight"]), tt(sd[p + ".bias"]), 1, pad)

    out = {}
    prev = conv(feats["res5"], "backbone.fpn_lateral5")
    out["p5"] = conv(prev, "backbone.fpn_output5", pad=1)
    for s in (4, 3, 2):
        top_down = F.interpolate(prev, scale_factor=2, mode="nearest")
        prev = conv(feats[f"res{s}"], f"backbone.fpn_lateral{s}") + top_down
        out[f"p{s}"] = conv(prev, f"backbone.fpn_output{s}", pad=1)
    out["p6"] = F.max_pool2d(out["p5"], 1, 2, 0)
    return out


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _assert_close(got, want, name, tol=3e-3):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = max(float(np.std(want)), 1e-3)
    err = float(np.abs(got - want).max()) / scale
    assert err < tol, f"{name}: normalized max err {err:.2e} (scale {scale:.3g})"


def _plain_fpn_cfg():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ("res2", "res3", "res4", "res5")
    cfg.MODEL.FPN.IN_FEATURES = ("res2", "res3", "res4", "res5")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_resnet50_fpn_pyramid_torch_parity():
    """Pyramid features p2..p6 must match the torch replica through the
    d2-name converter — pins ResNet stem/blocks/FrozenBN + FPN wiring."""
    rng = np.random.RandomState(0)
    sd = {**make_resnet50_sd(rng), **make_fpn_sd(rng)}

    x = (rng.rand(1, 64, 96, 3).astype(np.float32) - 0.5) * 4.0

    # torch side (NCHW)
    xt = tt(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = torch_fpn(torch_resnet50(xt, sd), sd)

    # our side: init template, convert, merge, apply
    cfg = _plain_fpn_cfg()
    backbone = build_backbone(cfg)
    variables = jax.jit(
        lambda: backbone.init(jax.random.PRNGKey(0), jnp.asarray(x))
    )()
    conv, report = state_dict_to_variables(
        sd, template={"params": {"backbone": variables["params"]}}
    )
    assert not report["unmatched"], report["unmatched"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    params = merge_variables(variables["params"], conv["params"]["backbone"])
    got = jax.jit(lambda p: backbone.apply({"params": p}, jnp.asarray(x)))(params)

    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        got_l = np.asarray(got[lvl]).transpose(0, 3, 1, 2)  # NHWC -> NCHW
        _assert_close(got_l, want[lvl].numpy(), lvl)


def test_rpn_head_torch_parity():
    """RPN objectness/delta maps across all 5 levels through the converter."""
    rng = np.random.RandomState(1)
    a = 3  # anchors per location
    sd = {
        "proposal_generator.rpn_head.conv.weight": _conv_w(rng, 256, 256, 3),
        "proposal_generator.rpn_head.conv.bias": (0.05 * rng.randn(256)).astype(np.float32),
        "proposal_generator.rpn_head.objectness_logits.weight": _conv_w(rng, a, 256, 1),
        "proposal_generator.rpn_head.objectness_logits.bias": (0.05 * rng.randn(a)).astype(np.float32),
        "proposal_generator.rpn_head.anchor_deltas.weight": _conv_w(rng, 4 * a, 256, 1),
        "proposal_generator.rpn_head.anchor_deltas.bias": (0.05 * rng.randn(4 * a)).astype(np.float32),
    }
    feats = [rng.randn(1, 2 ** (4 - i), 3 * 2 ** (4 - i), 256).astype(np.float32)
             for i in range(5)]

    with torch.no_grad():
        want_logits, want_deltas = [], []
        for f in feats:
            ft = tt(f.transpose(0, 3, 1, 2))
            t = F.relu(F.conv2d(ft, tt(sd["proposal_generator.rpn_head.conv.weight"]),
                                tt(sd["proposal_generator.rpn_head.conv.bias"]), 1, 1))
            want_logits.append(F.conv2d(
                t, tt(sd["proposal_generator.rpn_head.objectness_logits.weight"]),
                tt(sd["proposal_generator.rpn_head.objectness_logits.bias"])))
            want_deltas.append(F.conv2d(
                t, tt(sd["proposal_generator.rpn_head.anchor_deltas.weight"]),
                tt(sd["proposal_generator.rpn_head.anchor_deltas.bias"])))

    head = RPNHead(num_anchors=a, conv_dim=256)
    jf = [jnp.asarray(f) for f in feats]
    variables = jax.jit(lambda: head.init(jax.random.PRNGKey(0), jf))()
    conv, report = state_dict_to_variables(
        sd, template={"params": {"proposal_generator": variables["params"]}}
    )
    assert not report["unmatched"] and not report["mismatched"], report
    params = merge_variables(variables["params"], conv["params"]["proposal_generator"])
    got_logits, got_deltas = jax.jit(
        lambda p: head.apply({"params": p}, jf)
    )(params)

    for i in range(5):
        _assert_close(np.asarray(got_logits[i]).transpose(0, 3, 1, 2),
                      want_logits[i].numpy(), f"rpn_logits_l{i}", tol=1e-3)
        _assert_close(np.asarray(got_deltas[i]).transpose(0, 3, 1, 2),
                      want_deltas[i].numpy(), f"rpn_deltas_l{i}", tol=1e-3)


def test_box_head_and_predictor_torch_parity():
    """fc1 consumes a CHW-flattened pooled map in d2 vs HWC here — the
    converter's t_linear_from_chw permutation must make outputs identical."""
    rng = np.random.RandomState(2)
    num_classes = 5
    sd = {
        "roi_heads.box_head.fc1.weight": _lin_w(rng, 1024, 256 * 7 * 7),
        "roi_heads.box_head.fc1.bias": (0.05 * rng.randn(1024)).astype(np.float32),
        "roi_heads.box_head.fc2.weight": _lin_w(rng, 1024, 1024),
        "roi_heads.box_head.fc2.bias": (0.05 * rng.randn(1024)).astype(np.float32),
        "roi_heads.box_predictor.cls_score.weight": _lin_w(rng, num_classes + 1, 1024),
        "roi_heads.box_predictor.cls_score.bias": (0.05 * rng.randn(num_classes + 1)).astype(np.float32),
        "roi_heads.box_predictor.bbox_pred.weight": _lin_w(rng, 4 * num_classes, 1024),
        "roi_heads.box_predictor.bbox_pred.bias": (0.05 * rng.randn(4 * num_classes)).astype(np.float32),
    }
    pooled = rng.randn(9, 7, 7, 256).astype(np.float32)  # NHWC (ours)

    with torch.no_grad():
        xt = tt(pooled.transpose(0, 3, 1, 2)).flatten(1)  # CHW flatten (d2)
        h = F.relu(F.linear(xt, tt(sd["roi_heads.box_head.fc1.weight"]),
                            tt(sd["roi_heads.box_head.fc1.bias"])))
        h = F.relu(F.linear(h, tt(sd["roi_heads.box_head.fc2.weight"]),
                            tt(sd["roi_heads.box_head.fc2.bias"])))
        want_scores = F.linear(h, tt(sd["roi_heads.box_predictor.cls_score.weight"]),
                               tt(sd["roi_heads.box_predictor.cls_score.bias"]))
        want_deltas = F.linear(h, tt(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                               tt(sd["roi_heads.box_predictor.bbox_pred.bias"]))

    head = FastRCNNConvFCHead(num_conv=0, num_fc=2, fc_dim=1024)
    pred = FastRCNNOutputLayers(num_classes=num_classes)
    hv = head.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    pv = pred.init(jax.random.PRNGKey(1), jnp.zeros((9, 1024)))
    conv, report = state_dict_to_variables(
        sd,
        template={"params": {"roi_heads": {
            "box_head": hv["params"], "box_predictor": pv["params"],
        }}},
    )
    assert not report["unmatched"] and not report["mismatched"], report
    hp = merge_variables(hv["params"], conv["params"]["roi_heads"]["box_head"])
    pp = merge_variables(pv["params"], conv["params"]["roi_heads"]["box_predictor"])
    feats = head.apply({"params": hp}, jnp.asarray(pooled))
    got_scores, got_deltas = pred.apply({"params": pp}, feats)

    _assert_close(got_scores, want_scores.numpy(), "cls_score", tol=1e-3)
    _assert_close(got_deltas, want_deltas.numpy(), "bbox_pred", tol=1e-3)


def test_mask_head_torch_parity():
    """4 convs + 2x2/s2 deconv (IOHW layout) + 1x1 predictor."""
    rng = np.random.RandomState(3)
    num_classes = 4
    sd = {}
    for i in range(1, 5):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = (0.05 * rng.randn(256)).astype(np.float32)
    # torch ConvTranspose2d weight layout: (in, out, kh, kw)
    sd["roi_heads.mask_head.deconv.weight"] = (
        rng.randn(256, 256, 2, 2) * (2.0 / (256 * 4)) ** 0.5
    ).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = (0.05 * rng.randn(256)).astype(np.float32)
    sd["roi_heads.mask_head.predictor.weight"] = _conv_w(rng, num_classes, 256, 1)
    sd["roi_heads.mask_head.predictor.bias"] = (0.05 * rng.randn(num_classes)).astype(np.float32)

    pooled = rng.randn(6, 14, 14, 256).astype(np.float32)

    with torch.no_grad():
        xt = tt(pooled.transpose(0, 3, 1, 2))
        for i in range(1, 5):
            xt = F.relu(F.conv2d(xt, tt(sd[f"roi_heads.mask_head.mask_fcn{i}.weight"]),
                                 tt(sd[f"roi_heads.mask_head.mask_fcn{i}.bias"]), 1, 1))
        xt = F.relu(F.conv_transpose2d(
            xt, tt(sd["roi_heads.mask_head.deconv.weight"]),
            tt(sd["roi_heads.mask_head.deconv.bias"]), stride=2))
        want = F.conv2d(xt, tt(sd["roi_heads.mask_head.predictor.weight"]),
                        tt(sd["roi_heads.mask_head.predictor.bias"]))

    head = MaskRCNNConvUpsampleHead(num_classes=num_classes)
    hv = head.init(jax.random.PRNGKey(0), jnp.asarray(pooled))
    conv, report = state_dict_to_variables(
        sd, template={"params": {"roi_heads": {"mask_head": hv["params"]}}}
    )
    assert not report["unmatched"] and not report["mismatched"], report
    hp = merge_variables(hv["params"], conv["params"]["roi_heads"]["mask_head"])
    got = head.apply({"params": hp}, jnp.asarray(pooled))

    _assert_close(np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
                  "mask_logits", tol=1e-3)

"""Torch-golden parity for PAFPN and BiFPN wiring (VERDICT task #7).

Independent torch replicas of the reference pyramids, driven from random
reference-NAMED state dicts mapped through utils/converters.py:

  * PAFPN (ref pafpn_sr.py:149-199): top-down laterals WITHOUT output
    convs, bottom-up augmentation n_{k+1} = td_{k+1} + relu(down(n_k)),
    output convs on the augmented maps, p6 = k1/s2 subsample.
  * BiFPN (ref bifpn_sr.py:569-733): BeforeBiFPN laterals + dedicated
    c4/c5 skip convs + LastLevelP6P7; per-layer fusion with RAW learned
    weights (the reference never applies its _weight_act); layer 0's
    bottom-up pass reads the skip convs, layers >=1 re-read the
    BeforeBiFPN laterals; 'static_same' 3x3/s2 ZERO-padded max-pool
    downsampling; swish + SeparableConv(+BN eps 1e-3) fusion nodes.

Both replicas substitute nearest upsampling for the srf_module on BOTH
sides (interp="nearest"): the AF interpolator itself is torch-pinned in
test_afi_generator.py, and the pyramid wiring composes linearly with the
choice of upsampler.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from afigan_tpu.models.bifpn import BiFPN
from afigan_tpu.models.pafpn import PAFPN
from afigan_tpu.utils.converters import merge_variables, state_dict_to_variables


def tt(a):
    return torch.from_numpy(np.asarray(a))


def _conv_w(rng, o, i, k):
    std = (2.0 / (i * k * k)) ** 0.5
    return (rng.randn(o, i, k, k) * std).astype(np.float32)


def _bias(rng, c):
    return (0.05 * rng.randn(c)).astype(np.float32)


def _assert_close(got, want, name, tol=2e-3):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    scale = max(float(np.std(want)), 1e-3)
    err = float(np.abs(got - want).max()) / scale
    assert err < tol, f"{name}: normalized max err {err:.2e}"


# ---------------------------------------------------------------------------
# PAFPN
# ---------------------------------------------------------------------------

def make_pafpn_sd(rng):
    sd = {}
    in_ch = {2: 64, 3: 128, 4: 256, 5: 512}
    for s in (2, 3, 4, 5):
        sd[f"backbone.fpn_lateral{s}.weight"] = _conv_w(rng, 256, in_ch[s], 1)
        sd[f"backbone.fpn_lateral{s}.bias"] = _bias(rng, 256)
        sd[f"backbone.pafpn_output{s}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"backbone.pafpn_output{s}.bias"] = _bias(rng, 256)
        if s > 2:
            sd[f"backbone.pafpn_downsample{s}.weight"] = _conv_w(rng, 256, 256, 3)
            sd[f"backbone.pafpn_downsample{s}.bias"] = _bias(rng, 256)
    return sd


def torch_pafpn(feats, sd):
    def conv(x, p, pad=0, stride=1):
        return F.conv2d(x, tt(sd[p + ".weight"]), tt(sd[p + ".bias"]), stride, pad)

    # top-down, no output convs (ref :168-183)
    prev = conv(feats["res5"], "backbone.fpn_lateral5")
    topdown = [prev]
    for s in (4, 3, 2):
        td = F.interpolate(prev, scale_factor=2, mode="nearest")
        prev = conv(feats[f"res{s}"], f"backbone.fpn_lateral{s}") + td
        topdown.insert(0, prev)  # [n2, n3, n4, n5]

    # bottom-up augmentation (ref :185-196)
    out = {}
    pa_prev = topdown[0]
    out["p2"] = conv(pa_prev, "backbone.pafpn_output2", pad=1)
    for i, s in enumerate((3, 4, 5)):
        down = F.relu(conv(pa_prev, f"backbone.pafpn_downsample{s}", pad=1, stride=2))
        pa_prev = topdown[i + 1] + down
        out[f"p{s}"] = conv(pa_prev, f"backbone.pafpn_output{s}", pad=1)
    out["p6"] = F.max_pool2d(out["p5"], 1, 2, 0)
    return out


def test_pafpn_torch_parity():
    rng = np.random.RandomState(10)
    sd = make_pafpn_sd(rng)
    feats = {
        f"res{s}": rng.randn(1, 64 >> (s - 2), 96 >> (s - 2),
                             64 * 2 ** (s - 2)).astype(np.float32)
        for s in (2, 3, 4, 5)
    }

    with torch.no_grad():
        want = torch_pafpn(
            {k: tt(v.transpose(0, 3, 1, 2)) for k, v in feats.items()}, sd
        )

    pafpn = PAFPN(interp="nearest")
    jf = {k: jnp.asarray(v) for k, v in feats.items()}
    variables = jax.jit(lambda: pafpn.init(jax.random.PRNGKey(0), jf))()
    conv, report = state_dict_to_variables(
        sd, template={"params": {"backbone": {"pyramid": variables["params"]}}}
    )
    assert not report["unmatched"] and not report["mismatched"], report
    params = merge_variables(variables["params"],
                             conv["params"]["backbone"]["pyramid"])
    got = jax.jit(lambda p: pafpn.apply({"params": p}, jf))(params)

    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        _assert_close(np.asarray(got[lvl]).transpose(0, 3, 1, 2),
                      want[lvl].numpy(), f"pafpn_{lvl}")


# ---------------------------------------------------------------------------
# BiFPN
# ---------------------------------------------------------------------------

REPEAT = 2  # covers both the l==0 (skip-conv) and l>=1 (lateral) wirings
C = 64  # out_channels (small for CPU speed)


def _add_bn(sd, rng, p, c):
    sd[p + ".weight"] = (1.0 + 0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".bias"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    sd[p + ".running_var"] = (1.0 + 0.5 * rng.rand(c)).astype(np.float32)


def make_bifpn_sd(rng):
    sd = {}
    in_ch = {"lateral3": 96, "lateral4": 192, "lateral5": 384,
             "p4_skip": 192, "p5_skip": 384}
    for name, ic in in_ch.items():
        sd[f"backbone.before_bifpn.{name}.0.weight"] = _conv_w(rng, C, ic, 1)
        sd[f"backbone.before_bifpn.{name}.0.bias"] = _bias(rng, C)
        _add_bn(sd, rng, f"backbone.before_bifpn.{name}.1", C)
    sd["backbone.before_bifpn.top_block.p6.conv.weight"] = _conv_w(rng, C, 384, 1)
    sd["backbone.before_bifpn.top_block.p6.conv.bias"] = _bias(rng, C)
    _add_bn(sd, rng, "backbone.before_bifpn.top_block.p6.norm", C)

    for l in range(REPEAT):
        for idx, d in [(6, "up"), (5, "up"), (4, "up"), (3, "up"),
                       (4, "down"), (5, "down"), (6, "down"), (7, "down")]:
            p = f"backbone.BiFPNLayer_{l}_conv{idx}_{d}"
            dw = _conv_w(rng, C, 1, 3)  # (C, 1, 3, 3) depthwise
            sd[p + ".depthwise.weight"] = (
                rng.randn(C, 1, 3, 3) * (2.0 / 9) ** 0.5
            ).astype(np.float32)
            sd[p + ".pointwise.weight"] = _conv_w(rng, C, C, 1)
            sd[p + ".pointwise.bias"] = _bias(rng, C)
            _add_bn(sd, rng, p + ".norm", C)
        for idx in (6, 5, 4, 3):
            sd[f"backbone.BiFPNLayer_{l}_p{idx}_w1"] = (
                1.0 + 0.2 * rng.randn(2)
            ).astype(np.float32)
        for idx, n in [(4, 3), (5, 3), (6, 3), (7, 2)]:
            sd[f"backbone.BiFPNLayer_{l}_p{idx}_w2"] = (
                1.0 + 0.2 * rng.randn(n)
            ).astype(np.float32)
    return sd


def _t_bn(x, sd, p, eps=1e-3):
    w, b = tt(sd[p + ".weight"]), tt(sd[p + ".bias"])
    m, v = tt(sd[p + ".running_mean"]), tt(sd[p + ".running_var"])
    s = w / torch.sqrt(v + eps)
    return x * s[None, :, None, None] + (b - m * s)[None, :, None, None]


def _t_maxpool_static_same(x):
    # ref wrappers.py MaxPool2d(3, 2, 'static_same'): ZERO-pad (r, b) by 1
    x = F.pad(x, (0, 1, 0, 1))
    return F.max_pool2d(x, 3, 2, 0)


def _t_sep(x, sd, p):
    x = F.conv2d(x, tt(sd[p + ".depthwise.weight"]), None, 1, 1,
                 groups=x.shape[1])
    x = F.conv2d(x, tt(sd[p + ".pointwise.weight"]), tt(sd[p + ".pointwise.bias"]))
    return _t_bn(x, sd, p + ".norm")


def _t_swish(x):
    return x * torch.sigmoid(x)


def torch_bifpn(c3, c4, c5, sd):
    def lat(x, name):
        y = F.conv2d(x, tt(sd[f"backbone.before_bifpn.{name}.0.weight"]),
                     tt(sd[f"backbone.before_bifpn.{name}.0.bias"]))
        return _t_bn(y, sd, f"backbone.before_bifpn.{name}.1")

    p4_skip, p5_skip = lat(c4, "p4_skip"), lat(c5, "p5_skip")
    c6 = _t_maxpool_static_same(_t_bn(
        F.conv2d(c5, tt(sd["backbone.before_bifpn.top_block.p6.conv.weight"]),
                 tt(sd["backbone.before_bifpn.top_block.p6.conv.bias"])),
        sd, "backbone.before_bifpn.top_block.p6.norm"))
    c7 = _t_maxpool_static_same(c6)
    laterals = (lat(c3, "lateral3"), lat(c4, "lateral4"), lat(c5, "lateral5"),
                c6, c7)

    def fuse(w_key, inputs):
        w = tt(sd[w_key])  # RAW weights (ref quirk: no relu/normalize)
        return sum(x * wi for x, wi in zip(inputs, w))

    feats = laterals
    for l in range(REPEAT):
        p3, p4, p5, p6, p7 = feats
        up = lambda x: F.interpolate(x, scale_factor=2, mode="nearest")

        p6_up = _t_sep(_t_swish(fuse(f"backbone.BiFPNLayer_{l}_p6_w1", [p6, up(p7)])),
                       sd, f"backbone.BiFPNLayer_{l}_conv6_up")
        p5_up = _t_sep(_t_swish(fuse(f"backbone.BiFPNLayer_{l}_p5_w1", [p5, up(p6_up)])),
                       sd, f"backbone.BiFPNLayer_{l}_conv5_up")
        p4_up = _t_sep(_t_swish(fuse(f"backbone.BiFPNLayer_{l}_p4_w1", [p4, up(p5_up)])),
                       sd, f"backbone.BiFPNLayer_{l}_conv4_up")
        p3_up = _t_sep(_t_swish(fuse(f"backbone.BiFPNLayer_{l}_p3_w1", [p3, up(p4_up)])),
                       sd, f"backbone.BiFPNLayer_{l}_conv3_up")

        # bottom-up skips: layer 0 reads the skip convs; layers >=1 re-read
        # the BeforeBiFPN laterals (ref :597,615,...)
        skip4 = p4_skip if l == 0 else laterals[1]
        skip5 = p5_skip if l == 0 else laterals[2]
        skip6, p7_lat = laterals[3], laterals[4]

        def bu(skip, cur, bottom, idx):
            inputs = [skip, cur, _t_maxpool_static_same(bottom)] if skip is not None \
                else [cur, _t_maxpool_static_same(bottom)]
            fused = fuse(f"backbone.BiFPNLayer_{l}_p{idx}_w2", inputs)
            return _t_sep(_t_swish(fused), sd, f"backbone.BiFPNLayer_{l}_conv{idx}_down")

        p4_out = bu(skip4, p4_up, p3_up, 4)
        p5_out = bu(skip5, p5_up, p4_out, 5)
        p6_out = bu(skip6, p6_up, p5_out, 6)
        p7_out = bu(None, p7_lat, p6_out, 7)
        feats = (p3_up, p4_out, p5_out, p6_out, p7_out)
    return dict(zip(("p3", "p4", "p5", "p6", "p7"), feats))


def test_bifpn_torch_parity():
    rng = np.random.RandomState(20)
    sd = make_bifpn_sd(rng)
    # sizes follow the reference's size_divisibility-128 constraint so all
    # levels chain exactly (p6 = static_same(p5), up(p7) == p6, ...)
    c3 = rng.randn(1, 32, 48, 96).astype(np.float32)
    c4 = rng.randn(1, 16, 24, 192).astype(np.float32)
    c5 = rng.randn(1, 8, 12, 384).astype(np.float32)

    with torch.no_grad():
        want = torch_bifpn(tt(c3.transpose(0, 3, 1, 2)),
                           tt(c4.transpose(0, 3, 1, 2)),
                           tt(c5.transpose(0, 3, 1, 2)), sd)

    bifpn = BiFPN(in_features=("stage3", "stage4", "stage5"), out_channels=C,
                  fpn_repeat=REPEAT, norm="BN", interp="nearest")
    jf = {"stage3": jnp.asarray(c3), "stage4": jnp.asarray(c4),
          "stage5": jnp.asarray(c5)}
    variables = jax.jit(lambda: bifpn.init(jax.random.PRNGKey(0), jf))()
    template = {
        "params": {"backbone": {"pyramid": variables["params"]}},
        "batch_stats": {"backbone": {"pyramid": variables.get("batch_stats", {})}},
    }
    conv, report = state_dict_to_variables(sd, template=template)
    assert not report["unmatched"] and not report["mismatched"], report
    params = merge_variables(variables["params"],
                             conv["params"]["backbone"]["pyramid"])
    stats = merge_variables(variables.get("batch_stats", {}),
                            conv["batch_stats"]["backbone"]["pyramid"])
    got = jax.jit(
        lambda p, s: bifpn.apply({"params": p, "batch_stats": s}, jf)
    )(params, stats)

    for lvl in ("p3", "p4", "p5", "p6", "p7"):
        _assert_close(np.asarray(got[lvl]).transpose(0, 3, 1, 2),
                      want[lvl].numpy(), f"bifpn_{lvl}")

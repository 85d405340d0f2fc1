"""Torch-golden parity for the Swin backbone (VERDICT task #7).

Independent torch replica of the reference Swin Transformer
(ref: afigan/modeling/backbone/swin_transformer.py:80-625) driven from a
random reference-NAMED state dict mapped through utils/converters.py —
pins the relative-position-bias gather, the SW-MSA shifted-window mask
arithmetic, window partition order, PatchMerging element order, qkv
layout, and all LayerNorm placements (eps 1e-5, torch default).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from afigan_tpu.models.swin import SwinTransformer
from afigan_tpu.utils.converters import merge_variables, state_dict_to_variables

EMBED = 32
DEPTHS = (2, 2)
HEADS = (2, 4)
WS = 4


def tt(a):
    return torch.from_numpy(np.asarray(a))


def _lin_w(rng, o, i):
    return (rng.randn(o, i) * (1.0 / i) ** 0.5).astype(np.float32)


def make_swin_sd(rng):
    sd = {}
    pre = "backbone.bottom_up."
    sd[pre + "patch_embed.proj.weight"] = (
        rng.randn(EMBED, 3, 4, 4) * 0.1
    ).astype(np.float32)
    sd[pre + "patch_embed.proj.bias"] = (0.05 * rng.randn(EMBED)).astype(np.float32)
    sd[pre + "patch_embed.norm.weight"] = (1 + 0.1 * rng.randn(EMBED)).astype(np.float32)
    sd[pre + "patch_embed.norm.bias"] = (0.1 * rng.randn(EMBED)).astype(np.float32)
    for i, depth in enumerate(DEPTHS):
        dim = EMBED * 2 ** i
        for j in range(depth):
            p = f"{pre}layers.{i}.blocks.{j}."
            for n in ("norm1", "norm2"):
                sd[p + n + ".weight"] = (1 + 0.1 * rng.randn(dim)).astype(np.float32)
                sd[p + n + ".bias"] = (0.1 * rng.randn(dim)).astype(np.float32)
            sd[p + "attn.qkv.weight"] = _lin_w(rng, 3 * dim, dim)
            sd[p + "attn.qkv.bias"] = (0.05 * rng.randn(3 * dim)).astype(np.float32)
            sd[p + "attn.proj.weight"] = _lin_w(rng, dim, dim)
            sd[p + "attn.proj.bias"] = (0.05 * rng.randn(dim)).astype(np.float32)
            sd[p + "attn.relative_position_bias_table"] = (
                0.1 * rng.randn((2 * WS - 1) ** 2, HEADS[i])
            ).astype(np.float32)
            sd[p + "mlp.fc1.weight"] = _lin_w(rng, 4 * dim, dim)
            sd[p + "mlp.fc1.bias"] = (0.05 * rng.randn(4 * dim)).astype(np.float32)
            sd[p + "mlp.fc2.weight"] = _lin_w(rng, dim, 4 * dim)
            sd[p + "mlp.fc2.bias"] = (0.05 * rng.randn(dim)).astype(np.float32)
        if i < len(DEPTHS) - 1:
            p = f"{pre}layers.{i}.downsample."
            sd[p + "norm.weight"] = (1 + 0.1 * rng.randn(4 * dim)).astype(np.float32)
            sd[p + "norm.bias"] = (0.1 * rng.randn(4 * dim)).astype(np.float32)
            sd[p + "reduction.weight"] = _lin_w(rng, 2 * dim, 4 * dim)
    for i in range(len(DEPTHS)):
        dim = EMBED * 2 ** i
        sd[f"{pre}norm{i}.weight"] = (1 + 0.1 * rng.randn(dim)).astype(np.float32)
        sd[f"{pre}norm{i}.bias"] = (0.1 * rng.randn(dim)).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# Torch functional replica (published Swin architecture)
# ---------------------------------------------------------------------------

def _ln(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), tt(sd[p + ".weight"]), tt(sd[p + ".bias"]))


def _rel_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _t_window_attn(xw, sd, p, nh, ws, mask):
    bnw, n, c = xw.shape
    hd = c // nh
    qkv = F.linear(xw, tt(sd[p + "qkv.weight"]), tt(sd[p + "qkv.bias"]))
    qkv = qkv.reshape(bnw, n, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    table = tt(sd[p + "relative_position_bias_table"])
    bias = table[_rel_index(ws).view(-1)].view(n, n, nh).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(bnw // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.view(bnw, nh, n, n)
    attn = F.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
    return F.linear(out, tt(sd[p + "proj.weight"]), tt(sd[p + "proj.bias"]))


def _t_block(x, sd, p, nh, shift):
    # x: (B, H, W, C) torch
    # Detection-Swin semantics (ref swin_transformer.py:219-231): the
    # window NEVER shrinks — small maps are padded up to one window and
    # the shift stays active.
    b, h, w, c = x.shape
    ws = WS
    sh = shift

    shortcut = x
    y = _ln(x, sd, p + "norm1")
    hp = (h + ws - 1) // ws * ws
    wp = (w + ws - 1) // ws * ws
    y = F.pad(y, (0, 0, 0, wp - w, 0, hp - h))
    if sh > 0:
        y = torch.roll(y, (-sh, -sh), dims=(1, 2))
        img_mask = torch.zeros(hp, wp)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img_mask[hs, wsl] = cnt
                cnt += 1
        mw = img_mask.view(hp // ws, ws, wp // ws, ws).permute(0, 2, 1, 3)
        mw = mw.reshape(-1, ws * ws)
        mask = mw[:, None, :] - mw[:, :, None]
        mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))
    else:
        mask = None

    yw = y.view(b, hp // ws, ws, wp // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    yw = yw.reshape(-1, ws * ws, c)
    aw = _t_window_attn(yw, sd, p + "attn.", nh, ws, mask)
    y = aw.view(b, hp // ws, wp // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, hp, wp, c)
    if sh > 0:
        y = torch.roll(y, (sh, sh), dims=(1, 2))
    y = y[:, :h, :w]

    x = shortcut + y
    z = _ln(x, sd, p + "norm2")
    z = F.gelu(F.linear(z, tt(sd[p + "mlp.fc1.weight"]), tt(sd[p + "mlp.fc1.bias"])))
    z = F.linear(z, tt(sd[p + "mlp.fc2.weight"]), tt(sd[p + "mlp.fc2.bias"]))
    return x + z


def torch_swin(x, sd):
    pre = "backbone.bottom_up."
    y = F.conv2d(x, tt(sd[pre + "patch_embed.proj.weight"]),
                 tt(sd[pre + "patch_embed.proj.bias"]), 4)
    y = y.permute(0, 2, 3, 1)  # (B, H, W, C)
    y = _ln(y, sd, pre + "patch_embed.norm")

    outs = {}
    for i, depth in enumerate(DEPTHS):
        for j in range(depth):
            shift = 0 if j % 2 == 0 else WS // 2
            y = _t_block(y, sd, f"{pre}layers.{i}.blocks.{j}.", HEADS[i], shift)
        outs[f"stage{i+2}"] = _ln(y, sd, f"{pre}norm{i}")
        if i < len(DEPTHS) - 1:
            b, h, w, c = y.shape
            if h % 2 or w % 2:
                y = F.pad(y, (0, 0, 0, w % 2, 0, h % 2))
            x0 = y[:, 0::2, 0::2]
            x1 = y[:, 1::2, 0::2]
            x2 = y[:, 0::2, 1::2]
            x3 = y[:, 1::2, 1::2]
            y = torch.cat([x0, x1, x2, x3], -1)
            y = _ln(y, sd, f"{pre}layers.{i}.downsample.norm")
            y = F.linear(y, tt(sd[f"{pre}layers.{i}.downsample.reduction.weight"]))
    return outs


def test_swin_torch_parity():
    rng = np.random.RandomState(30)
    sd = make_swin_sd(rng)
    # 40x56 input -> 10x14 patch grid: not window-multiple (pads to 12x16)
    # AND > window 4, so shifted blocks exercise the SW-MSA masks
    x = rng.randn(1, 40, 56, 3).astype(np.float32)

    with torch.no_grad():
        want = torch_swin(tt(x.transpose(0, 3, 1, 2)), sd)

    model = SwinTransformer(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, window_size=WS,
        drop_path_rate=0.0, out_features=("stage2", "stage3"),
    )
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x)))()
    conv, report = state_dict_to_variables(
        sd, template={"params": {"backbone": {"bottom_up": variables["params"]}}}
    )
    assert not report["unmatched"] and not report["mismatched"], report
    params = merge_variables(variables["params"],
                             conv["params"]["backbone"]["bottom_up"])
    got = jax.jit(lambda p: model.apply({"params": p}, jnp.asarray(x)))(params)

    for stage in ("stage2", "stage3"):
        _got = np.asarray(got[stage], np.float32)
        _want = want[stage].numpy()
        scale = max(float(np.std(_want)), 1e-3)
        err = float(np.abs(_got - _want).max()) / scale
        assert err < 2e-3, f"{stage}: normalized max err {err:.2e}"


def test_swin_torch_parity_map_smaller_than_window():
    """Maps SMALLER than the window (16x24 input -> stage3 grid 2x3 <
    ws 4): the detection Swin pads up to one window and keeps the shift
    active (ref swin_transformer.py:219-231) — the param shapes must not
    depend on resolution (multi-scale TTA inits once, applies at every
    scale)."""
    rng = np.random.RandomState(31)
    sd = make_swin_sd(rng)
    x = rng.randn(1, 16, 24, 3).astype(np.float32)

    with torch.no_grad():
        want = torch_swin(tt(x.transpose(0, 3, 1, 2)), sd)

    model = SwinTransformer(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, window_size=WS,
        drop_path_rate=0.0, out_features=("stage2", "stage3"),
    )
    # init at a LARGER resolution, apply at the small one — pins the
    # resolution-independent param shapes the TTA path requires
    x_big = rng.randn(1, 40, 56, 3).astype(np.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x_big)))()
    conv, report = state_dict_to_variables(
        sd, template={"params": {"backbone": {"bottom_up": variables["params"]}}}
    )
    assert not report["unmatched"] and not report["mismatched"], report
    params = merge_variables(variables["params"],
                             conv["params"]["backbone"]["bottom_up"])
    got = jax.jit(lambda p: model.apply({"params": p}, jnp.asarray(x)))(params)

    for stage in ("stage2", "stage3"):
        _got = np.asarray(got[stage], np.float32)
        _want = want[stage].numpy()
        scale = max(float(np.std(_want)), 1e-3)
        err = float(np.abs(_got - _want).max()) / scale
        assert err < 2e-3, f"{stage}: normalized max err {err:.2e}"

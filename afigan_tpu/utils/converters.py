"""Torch/d2 checkpoint → flax param-tree converters.

BASELINE.json requires the reference's released checkpoints to load.
This module reads the three formats the reference handles (SURVEY §5.4;
ref afigan/engine/checkpoint.py:29-62):
  * d2 model-zoo ``.pkl`` ({"model": {...}, "__author__": ...}) — numpy
  * Caffe2 ImageNet ``.pkl`` (R-50.pkl style names) — converted to d2
    naming first
  * torch ``.pth`` state dicts (stage-1 G_0/D_0 outputs)

and maps names into our flax trees with layout transposes:
  conv OIHW→HWIO, conv-transpose IOHW→HWIO, linear (out,in)→(in,out),
  BatchNorm running stats split into the ``batch_stats`` collection.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .pkl (d2 zoo / Caffe2) or .pth (torch) into numpy name→array."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if "model" in data:
            data = data["model"]
        if "blobs" in data:
            data = data["blobs"]
        out = {}
        for k, v in data.items():
            if k.endswith(("_momentum",)) or k.startswith("__"):
                continue
            out[k] = np.asarray(v)
        # Caffe2-style names → d2 names if needed
        if any(k.endswith(("_w", "_b")) or "branch" in k for k in out):
            out = convert_c2_resnet_names(out)
        return out
    # torch .pth
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict"):
        if isinstance(data, dict) and key in data and isinstance(data[key], dict):
            data = data[key]
    return {
        k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in data.items()
        if hasattr(v, "shape")
    }


def convert_c2_resnet_names(weights: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Caffe2 ImageNet ResNet names → d2 names (stem/res{s}.{i}.conv{j})."""
    out = {}
    for k, v in weights.items():
        name = k
        name = re.sub(r"^conv1_(w)$", r"stem.conv1.weight", name)
        name = re.sub(r"^res_conv1_bn_(s)$", r"stem.conv1.norm.weight", name)
        name = re.sub(r"^res_conv1_bn_(b)$", r"stem.conv1.norm.bias", name)
        m = re.match(r"^res(\d)_(\d+)_branch([12])([a-c]?)_(w|bn_s|bn_b)$", k)
        if m:
            stage, block, branch, sub, kind = m.groups()
            if branch == "1":
                layer = "shortcut"
            else:
                layer = {"a": "conv1", "b": "conv2", "c": "conv3"}[sub]
            suffix = {
                "w": "weight", "bn_s": "norm.weight", "bn_b": "norm.bias"
            }[kind]
            name = f"res{stage}.{block}.{layer}.{suffix}"
        out[name] = v
    return out


# ---------------------------------------------------------------------------
# Layout transforms
# ---------------------------------------------------------------------------

def t_conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_deconv(w):  # IOHW -> HWIO(in,out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def t_linear(w):  # (out,in) -> (in,out)
    return np.ascontiguousarray(w.T)


def t_linear_from_chw(w, pool: int = 7):  # first FC after NCHW spatial flatten
    """d2 box heads flatten pooled features in (C, H, W) order; our NHWC head
    flattens (H, W, C). Permute fc1's input dim accordingly. ``pool`` is the
    pooler resolution — ``state_dict_to_variables`` infers it from the
    checkpoint's own channel counts (a hardcoded 7 would silently scramble
    the permutation for e.g. a 14x14 pooler whose C*H*W is still divisible
    by 49); if the input dim is not divisible by pool^2 fall back to a
    plain transpose."""
    out_f, in_f = w.shape
    if in_f % (pool * pool) != 0:
        return t_linear(w)
    c = in_f // (pool * pool)
    w4 = w.reshape(out_f, c, pool, pool).transpose(0, 2, 3, 1).reshape(out_f, in_f)
    return np.ascontiguousarray(w4.T)


def _infer_box_pool(state: Dict, in_f: int, default: int = 7) -> int:
    """Infer the box pooler resolution from the checkpoint: fc1's input is
    C * P^2 where C is the last box-head conv's out-channels (conv heads)
    or the FPN/RPN channel width. Falls back to ``default``."""
    c = None
    for key in (
        # a conv box head: fc1 consumes the last conv's output channels
        *sorted((k for k in state if re.match(
            r"^roi_heads\.box_head\.(?:\d\.)?conv\d\.weight$", k)), reverse=True),
        "proposal_generator.rpn_head.conv.weight",
        "backbone.fpn_lateral2.weight",
        "backbone.fpn_lateral3.weight",
    ):
        if key in state and hasattr(state[key], "shape"):
            c = int(state[key].shape[0])
            break
    if c and in_f % c == 0:
        p = int(round(float(in_f // c) ** 0.5))
        if p * p * c == in_f:
            return p
    return default


def t_id(w):
    return np.asarray(w)


# ---------------------------------------------------------------------------
# Name translation: d2 torch key -> (collection, flax path, transform)
# ---------------------------------------------------------------------------

_NORM_SUFFIX = {
    "norm.weight": ("scale", t_id, "norm_param"),
    "norm.bias": ("bias", t_id, "norm_param"),
    "norm.running_mean": ("mean", t_id, "norm_stat"),
    "norm.running_var": ("var", t_id, "norm_stat"),
}


def _gen_seq_to_ours(rest: str) -> Optional[Tuple[Tuple[str, ...], Callable]]:
    """Map the reference Generator's Sequential indices to our names.

    torch: Generators.0.{0,2,4}.0 = head/mid/tail convs, .3.0 = deconv,
    .1.RDBs.{i}.conv{j}(.0) = dense blocks (ref generator_rdb.py:87-121).
    """
    m = re.match(r"^0\.0\.0\.(weight|bias)$", rest)
    if m:
        return ("generators_0/head", "conv", m.group(1)), t_conv if m.group(1) == "weight" else t_id
    m = re.match(r"^0\.2\.0\.(weight|bias)$", rest)
    if m:
        return ("generators_0/mid", "conv", m.group(1)), t_conv if m.group(1) == "weight" else t_id
    m = re.match(r"^0\.4\.0\.(weight|bias)$", rest)
    if m:
        return ("generators_0/tail", "conv", m.group(1)), t_conv if m.group(1) == "weight" else t_id
    m = re.match(r"^0\.3\.0\.(weight|bias)$", rest)
    if m:
        if m.group(1) == "weight":
            return ("generators_0/up", "kernel"), t_deconv
        return ("generators_0/up", "bias"), t_id
    m = re.match(r"^0\.1\.RDBs\.(\d+)\.conv(\d)(?:\.0)?\.(weight|bias)$", rest)
    if m:
        i, j, wb = m.groups()
        return (
            ("generators_0/rir", f"rdb{i}", f"conv{j}", "conv",
             "kernel" if wb == "weight" else "bias"),
            t_conv if wb == "weight" else t_id,
        )
    return None


def translate_generator_key(key: str):
    """Standalone stage-1 G key ('Generators.…') → (path, transform).

    NOTE: names like "generators_0/head" are SINGLE flax dict keys (the
    module names contain a literal slash) — do not split them.
    """
    if not key.startswith("Generators."):
        return None
    out = _gen_seq_to_ours(key[len("Generators."):])
    if out is None:
        return None
    path, tf = out
    path = tuple("kernel" if x == "weight" else x for x in path)
    return path, tf


def translate_discriminator_key(key: str):
    """Stage-1 D key ('Discriminators.0.{i}.0.*') → (collection, path, tf).

    torch blocks: Discriminators.0.{0,1,2} = Seq(Conv2d(+BN norm), LReLU),
    Discriminators.0.3 = Seq(Conv2d) (ref feature_patch_discriminator.py:27-49).
    d2 Conv2d fuses norm as submodule: '...0.0.weight' conv, '...0.0.norm.*'.
    """
    m = re.match(r"^Discriminators\.0\.(\d)\.0\.(.+)$", key)
    if m is None:
        return None
    idx, rest = int(m.group(1)), m.group(2)
    base = f"discriminators_0/block{idx}" if idx < 3 else "discriminators_0/out"
    if rest == "weight":
        return "params", (base, "conv", "kernel"), t_conv
    if rest == "bias":
        return "params", (base, "conv", "bias"), t_id
    if rest in _NORM_SUFFIX:
        leaf, tf, kind = _NORM_SUFFIX[rest]
        coll = "params" if kind == "norm_param" else "batch_stats"
        return coll, (base, "norm", leaf), tf
    return None


def translate_d2_key(key: str, frozen_bn: bool = True):
    """Full-detector d2 key → (collection, flax path tuple, transform).

    Returns None for keys we don't recognize (caller logs them, matching
    the reference's checkpoint-matching logs, ref checkpoint.py:190-198).
    ``frozen_bn``: backbone norms are FrozenBN (all 4 arrays in params).
    """
    k = key

    def norm_dest(prefix_path, rest):
        if rest not in _NORM_SUFFIX:
            return None  # e.g. num_batches_tracked — unrecognized, skip
        leaf, tf, kind = _NORM_SUFFIX[rest]
        # FrozenBN keeps stats in params; live BN splits them into
        # batch_stats
        coll = "params" if (frozen_bn or kind == "norm_param") else "batch_stats"
        return coll, prefix_path + ("norm", leaf), tf

    # ---- backbone.bottom_up (ResNet / ResNeSt deep stem) ----
    m = re.match(r"^backbone\.bottom_up\.stem\.(conv1(?:_\d)?)\.(.+)$", k)
    if m:
        conv_name, rest = m.groups()
        base = ("backbone", "bottom_up", "stem", conv_name)
        if rest == "weight":
            return "params", base + ("conv", "kernel"), t_conv
        if rest in _NORM_SUFFIX:
            return norm_dest(base, rest)
    # ResNeSt SplAtConv2d inside conv2 (ref splat.py:42-51):
    #   conv2.conv/bn0 → conv2/conv/{conv,norm}; conv2.fc1/bn1 → conv2/fc1;
    #   conv2.fc2 → conv2/fc2
    m = re.match(
        r"^backbone\.bottom_up\.res(\d)\.(\d+)\.conv2\.(conv|bn0|fc1|bn1|fc2)\.(.+)$", k
    )
    if m:
        stage, block, part, rest = m.groups()
        blk = ("backbone", "bottom_up", f"res{stage}/block{block}", "conv2")
        if part == "conv":
            if rest == "weight":
                return "params", blk + ("conv", "conv", "kernel"), t_conv
            if rest == "bias":
                return "params", blk + ("conv", "conv", "bias"), t_id
            if rest in _NORM_SUFFIX:
                return norm_dest(blk + ("conv",), rest)
        if part == "bn0":
            return norm_dest(blk + ("conv",), f"norm.{rest}")
        if part in ("fc1", "fc2"):
            if rest == "weight":
                return "params", blk + (part, "conv", "kernel"), t_conv
            if rest == "bias":
                return "params", blk + (part, "conv", "bias"), t_id
        if part == "bn1":
            return norm_dest(blk + ("fc1",), f"norm.{rest}")
    m = re.match(
        r"^backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.(.+)$", k
    )
    if m:
        stage, block, layer, rest = m.groups()
        # "res2/block0" is a SINGLE flax key (module name contains a slash)
        base = ("backbone", "bottom_up", f"res{stage}/block{block}", layer)
        if rest == "weight":
            return "params", base + ("conv", "kernel"), t_conv
        if rest in _NORM_SUFFIX:
            return norm_dest(base, rest)

    # ---- Swin (ref swin_transformer.py naming) ----
    m = re.match(r"^backbone\.bottom_up\.patch_embed\.proj\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return (
            "params",
            ("backbone", "bottom_up", "patch_embed",
             "kernel" if wb == "weight" else "bias"),
            t_conv if wb == "weight" else t_id,
        )
    m = re.match(r"^backbone\.bottom_up\.patch_embed\.norm\.(weight|bias)$", k)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return "params", ("backbone", "bottom_up", "patch_norm", leaf), t_id
    m = re.match(r"^backbone\.bottom_up\.norm(\d)\.(weight|bias)$", k)
    if m:
        i, wb = m.groups()
        leaf = "scale" if wb == "weight" else "bias"
        return (
            "params",
            ("backbone", "bottom_up", f"norm_stage{int(i)+2}", leaf),
            t_id,
        )
    m = re.match(
        r"^backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.(.+)$", k
    )
    if m:
        i, j, rest = m.groups()
        base = ("backbone", "bottom_up", f"stage{int(i)+2}/block{j}")
        mm = re.match(r"^norm([12])\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(2) == "weight" else "bias"
            return "params", base + (f"norm{mm.group(1)}", leaf), t_id
        mm = re.match(r"^attn\.(qkv|proj)\.(weight|bias)$", rest)
        if mm:
            layer, wb = mm.groups()
            return (
                "params",
                base + ("attn", layer, "kernel" if wb == "weight" else "bias"),
                t_linear if wb == "weight" else t_id,
            )
        if rest == "attn.relative_position_bias_table":
            return "params", base + ("attn", "relative_position_bias_table"), t_id
        mm = re.match(r"^mlp\.fc([12])\.(weight|bias)$", rest)
        if mm:
            fi, wb = mm.groups()
            return (
                "params",
                base + (f"mlp_fc{fi}", "kernel" if wb == "weight" else "bias"),
                t_linear if wb == "weight" else t_id,
            )
    m = re.match(
        r"^backbone\.bottom_up\.layers\.(\d)\.downsample\.(reduction\.weight|norm\.weight|norm\.bias)$",
        k,
    )
    if m:
        i, rest = m.groups()
        base = ("backbone", "bottom_up", f"stage{int(i)+2}/downsample")
        if rest == "reduction.weight":
            return "params", base + ("reduction", "kernel"), t_linear
        leaf = "scale" if rest == "norm.weight" else "bias"
        return "params", base + ("norm", leaf), t_id

    # ---- FPN laterals/outputs (+ PAFPN names) ----
    m = re.match(
        r"^backbone\.(fpn_lateral\d|fpn_output\d|pafpn_output\d|pafpn_downsample\d)\.(.+)$",
        k,
    )
    if m:
        conv_name, rest = m.groups()
        base = ("backbone", "pyramid", conv_name)
        if rest == "weight":
            return "params", base + ("conv", "kernel"), t_conv
        if rest == "bias":
            return "params", base + ("conv", "bias"), t_id
        if rest in _NORM_SUFFIX:
            return norm_dest(base, rest)

    # ---- BiFPN (ref bifpn_sr.py: BeforeBiFPNLayer + unrolled layers) ----
    m = re.match(
        r"^backbone\.before_bifpn\.(lateral\d|p\d_skip)\.([01])\.(.+)$", k
    )
    if m:
        name, part, rest = m.groups()
        if part == "0":  # 1x1 conv
            if rest == "weight":
                return "params", ("backbone", "pyramid", name, "conv", "kernel"), t_conv
            if rest == "bias":
                return "params", ("backbone", "pyramid", name, "conv", "bias"), t_id
        else:  # BatchNorm
            key2 = f"norm.{rest}"
            if key2 in _NORM_SUFFIX:
                leaf, tf, kind = _NORM_SUFFIX[key2]
                coll = "params" if kind == "norm_param" else "batch_stats"
                return coll, ("backbone", "pyramid", f"{name}_bn", leaf), tf
    m = re.match(
        r"^backbone\.before_bifpn\.top_block\.p6\.(conv|norm)\.(.+)$", k
    )
    if m:
        part, rest = m.groups()
        if part == "conv":
            if rest == "weight":
                return "params", ("backbone", "pyramid", "p6_resample", "conv", "kernel"), t_conv
            if rest == "bias":
                return "params", ("backbone", "pyramid", "p6_resample", "conv", "bias"), t_id
        else:
            key2 = f"norm.{rest}"
            if key2 in _NORM_SUFFIX:
                leaf, tf, kind = _NORM_SUFFIX[key2]
                coll = "params" if kind == "norm_param" else "batch_stats"
                return coll, ("backbone", "pyramid", "p6_resample_bn", leaf), tf
    m = re.match(
        r"^backbone\.BiFPNLayer_(\d+)_conv(\d)_(up|down)\.(depthwise|pointwise|norm)\.(.+)$",
        k,
    )
    if m:
        layer, idx, direction, part, rest = m.groups()
        base = ("backbone", "pyramid", f"layer{layer}_conv{idx}_{direction}")
        if part in ("depthwise", "pointwise"):
            if rest == "weight":
                return "params", base + (part, "kernel"), t_conv
            if rest == "bias":
                return "params", base + (part, "bias"), t_id
        else:
            key2 = f"norm.{rest}"
            if key2 in _NORM_SUFFIX:
                leaf, tf, kind = _NORM_SUFFIX[key2]
                coll = "params" if kind == "norm_param" else "batch_stats"
                return coll, base + ("norm", leaf), tf
    m = re.match(r"^backbone\.BiFPNLayer_(\d+)_p(\d)_w([12])$", k)
    if m:
        layer, idx, wi = m.groups()
        return "params", ("backbone", "pyramid", f"layer{layer}_p{idx}_w{wi}"), t_id

    # ---- srf_module inside any pyramid ----
    m = re.match(r"^backbone\.srf_module\.Generators\.(.+)$", k)
    if m:
        out = _gen_seq_to_ours(m.group(1))
        if out:
            path, tf = out
            path = tuple("kernel" if x == "weight" else x for x in path)
            return "params", ("backbone", "pyramid", "srf_module") + path, tf

    # ---- RPN ----
    m = re.match(
        r"^proposal_generator\.rpn_head\.(conv|objectness_logits|anchor_deltas)\.(weight|bias)$",
        k,
    )
    if m:
        layer, wb = m.groups()
        return (
            "params",
            ("proposal_generator", layer, "conv", "kernel" if wb == "weight" else "bias"),
            t_conv if wb == "weight" else t_id,
        )

    # ---- box head (standard + cascade index) ----
    m = re.match(r"^roi_heads\.box_head\.(?:(\d)\.)?fc(\d)\.(weight|bias)$", k)
    if m:
        stage, i, wb = m.groups()
        head = f"box_head_{stage}" if stage is not None else "box_head"
        # fc1 consumes the spatially-flattened pooled map: CHW (torch) vs
        # HWC (ours) — permute its input dim; later FCs see flat vectors.
        tf = t_linear_from_chw if (wb == "weight" and i == "1") else (
            t_linear if wb == "weight" else t_id
        )
        return (
            "params",
            ("roi_heads", head, f"fc{i}", "kernel" if wb == "weight" else "bias"),
            tf,
        )
    m = re.match(r"^roi_heads\.box_head\.(?:(\d)\.)?conv(\d)\.(.+)$", k)
    if m:
        stage, i, rest = m.groups()
        head = f"box_head_{stage}" if stage is not None else "box_head"
        base = ("roi_heads", head, f"conv{i}")
        if rest == "weight":
            return "params", base + ("conv", "kernel"), t_conv
        if rest == "bias":
            return "params", base + ("conv", "bias"), t_id
        if rest in _NORM_SUFFIX:
            leaf, tf, kind = _NORM_SUFFIX[rest]
            coll = "params" if kind == "norm_param" else "batch_stats"
            return coll, base + ("norm", leaf), tf
    m = re.match(
        r"^roi_heads\.box_predictor\.(?:(\d)\.)?(cls_score|bbox_pred)\.(weight|bias)$", k
    )
    if m:
        stage, layer, wb = m.groups()
        pred = f"box_predictor_{stage}" if stage is not None else "box_predictor"
        return (
            "params",
            ("roi_heads", pred, layer, "kernel" if wb == "weight" else "bias"),
            t_linear if wb == "weight" else t_id,
        )

    # ---- mask head ----
    m = re.match(r"^roi_heads\.mask_head\.mask_fcn(\d)\.(.+)$", k)
    if m:
        i, rest = m.groups()
        base = ("roi_heads", "mask_head", f"mask_fcn{i}")
        if rest == "weight":
            return "params", base + ("conv", "kernel"), t_conv
        if rest == "bias":
            return "params", base + ("conv", "bias"), t_id
        if rest in _NORM_SUFFIX:
            leaf, tf, kind = _NORM_SUFFIX[rest]
            coll = "params" if kind == "norm_param" else "batch_stats"
            return coll, base + ("norm", leaf), tf
    m = re.match(r"^roi_heads\.mask_head\.deconv\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return (
            "params",
            ("roi_heads", "mask_head", "deconv", "kernel" if wb == "weight" else "bias"),
            t_deconv if wb == "weight" else t_id,
        )
    m = re.match(r"^roi_heads\.mask_head\.predictor\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return (
            "params",
            ("roi_heads", "mask_head", "predictor", "conv",
             "kernel" if wb == "weight" else "bias"),
            t_conv if wb == "weight" else t_id,
        )

    # ---- keypoint head (d2 KRCNNConvDeconvUpsampleHead) ----
    m = re.match(r"^roi_heads\.keypoint_head\.conv_fcn(\d+)\.(weight|bias)$", k)
    if m:
        i, wb = m.groups()
        return (
            "params",
            ("roi_heads", "keypoint_head", f"conv_fcn{i}", "conv",
             "kernel" if wb == "weight" else "bias"),
            t_conv if wb == "weight" else t_id,
        )
    m = re.match(r"^roi_heads\.keypoint_head\.score_lowres\.(weight|bias)$", k)
    if m:
        wb = m.group(1)
        return (
            "params",
            ("roi_heads", "keypoint_head", "score_lowres",
             "kernel" if wb == "weight" else "bias"),
            t_deconv if wb == "weight" else t_id,
        )
    return None


# ---------------------------------------------------------------------------
# Tree assembly
# ---------------------------------------------------------------------------

def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def state_dict_to_variables(
    state: Dict[str, np.ndarray],
    template: Optional[Dict] = None,
    translate: Callable = translate_d2_key,
    strict_shapes: bool = True,
    imagenet_backbone_only: bool = False,
) -> Tuple[Dict, Dict]:
    """Convert a torch state dict into flax {params, batch_stats} trees.

    Args:
        template: optional variables dict ({'params': ..., ...}) to verify
            paths/shapes against.
        imagenet_backbone_only: keys have no 'backbone.bottom_up.' prefix
            (ImageNet pretrain pkls) — they are prefixed first.

    Returns: (variables, report) where report lists matched / skipped /
    shape-mismatched keys (the reference logs the same, checkpoint.py:190-198).
    """
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    report = {"matched": [], "unmatched": [], "mismatched": []}
    for k, v in state.items():
        key = k
        if imagenet_backbone_only and not key.startswith("backbone."):
            key = "backbone.bottom_up." + key
        tr = translate(key)
        if tr is None:
            report["unmatched"].append(k)
            continue
        if len(tr) == 3:
            coll, path, tf = tr
        else:
            path, tf = tr
            coll = "params"
        if tf is t_linear_from_chw:
            arr = tf(v, pool=_infer_box_pool(state, int(v.shape[1])))
        else:
            arr = tf(v)
        if template is not None:
            want = _get_path(template.get(coll, {}), path)
            if want is None:
                report["unmatched"].append(k)
                continue
            if tuple(np.shape(want)) != tuple(arr.shape):
                report["mismatched"].append((k, tuple(arr.shape), tuple(np.shape(want))))
                if strict_shapes:
                    continue
        _set_path(out[coll], path, arr)
        report["matched"].append(k)
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out, report


def merge_variables(base: Dict, loaded: Dict) -> Dict:
    """Overlay loaded arrays onto a full variables tree (init → load)."""

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = merge(dst[k], v)
            else:
                out[k] = v
        return out

    return merge(base, loaded)

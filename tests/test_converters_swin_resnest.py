"""Swin / ResNeSt checkpoint-name translation against real param templates."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.config import get_cfg
from afigan_tpu.models import build_resnest, build_swin
from afigan_tpu.utils.converters import state_dict_to_variables, translate_d2_key


def test_swin_key_translation_covers_template():
    cfg = get_cfg()
    cfg.MODEL.SWINT.EMBED_DIM = 24
    cfg.MODEL.SWINT.DEPTHS = [2, 2]
    cfg.MODEL.SWINT.NUM_HEADS = [3, 6]
    cfg.MODEL.SWINT.WINDOW_SIZE = 4
    cfg.MODEL.SWINT.OUT_FEATURES = ["stage2", "stage3"]
    model = build_swin(cfg)
    template = {
        "params": {
            "backbone": {
                "bottom_up": model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
                )["params"]
            }
        }
    }
    C = 24
    sd = {
        "backbone.bottom_up.patch_embed.proj.weight": np.zeros((C, 3, 4, 4), np.float32),
        "backbone.bottom_up.patch_embed.proj.bias": np.zeros(C, np.float32),
        "backbone.bottom_up.patch_embed.norm.weight": np.zeros(C, np.float32),
        "backbone.bottom_up.layers.0.blocks.0.norm1.weight": np.zeros(C, np.float32),
        "backbone.bottom_up.layers.0.blocks.0.attn.qkv.weight": np.zeros(
            (3 * C, C), np.float32
        ),
        "backbone.bottom_up.layers.0.blocks.0.attn.qkv.bias": np.zeros(3 * C, np.float32),
        "backbone.bottom_up.layers.0.blocks.0.attn.proj.weight": np.zeros((C, C), np.float32),
        "backbone.bottom_up.layers.0.blocks.0.attn.relative_position_bias_table": np.zeros(
            (49, 3), np.float32
        ),
        "backbone.bottom_up.layers.0.blocks.1.mlp.fc1.weight": np.zeros((4 * C, C), np.float32),
        "backbone.bottom_up.layers.0.blocks.1.mlp.fc2.bias": np.zeros(C, np.float32),
        "backbone.bottom_up.layers.0.downsample.reduction.weight": np.zeros(
            (2 * C, 4 * C), np.float32
        ),
        "backbone.bottom_up.layers.0.downsample.norm.weight": np.zeros(4 * C, np.float32),
        "backbone.bottom_up.norm0.weight": np.zeros(C, np.float32),
        "backbone.bottom_up.norm1.bias": np.zeros(2 * C, np.float32),
    }
    variables, report = state_dict_to_variables(sd, template, translate_d2_key)
    assert not report["unmatched"], report["unmatched"]
    assert not report["mismatched"], report["mismatched"]


def test_resnest_key_translation_covers_template():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RADIX = 2
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    model = build_resnest(cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    template = {
        "params": {"backbone": {"bottom_up": variables["params"]}},
        "batch_stats": {"backbone": {"bottom_up": variables["batch_stats"]}},
    }
    sd = {
        "backbone.bottom_up.stem.conv1_1.weight": np.zeros((32, 3, 3, 3), np.float32),
        "backbone.bottom_up.stem.conv1_1.norm.weight": np.zeros(32, np.float32),
        "backbone.bottom_up.stem.conv1_1.norm.running_mean": np.zeros(32, np.float32),
        "backbone.bottom_up.stem.conv1_3.weight": np.zeros((64, 32, 3, 3), np.float32),
        "backbone.bottom_up.res2.0.conv1.weight": np.zeros((64, 64, 1, 1), np.float32),
        "backbone.bottom_up.res2.0.conv1.norm.running_var": np.ones(64, np.float32),
        # SplAtConv2d parts
        "backbone.bottom_up.res2.0.conv2.conv.weight": np.zeros((128, 32, 3, 3), np.float32),
        "backbone.bottom_up.res2.0.conv2.bn0.weight": np.zeros(128, np.float32),
        "backbone.bottom_up.res2.0.conv2.bn0.running_mean": np.zeros(128, np.float32),
        "backbone.bottom_up.res2.0.conv2.fc1.weight": np.zeros((32, 64, 1, 1), np.float32),
        "backbone.bottom_up.res2.0.conv2.fc1.bias": np.zeros(32, np.float32),
        "backbone.bottom_up.res2.0.conv2.bn1.weight": np.zeros(32, np.float32),
        "backbone.bottom_up.res2.0.conv2.fc2.weight": np.zeros((128, 32, 1, 1), np.float32),
        "backbone.bottom_up.res2.0.shortcut.weight": np.zeros((256, 64, 1, 1), np.float32),
        "backbone.bottom_up.res2.0.conv3.weight": np.zeros((256, 64, 1, 1), np.float32),
    }
    translate = functools.partial(translate_d2_key, frozen_bn=False)
    variables2, report = state_dict_to_variables(sd, template, translate)
    assert not report["unmatched"], report["unmatched"]
    assert not report["mismatched"], report["mismatched"]
    assert "batch_stats" in variables2  # running stats routed correctly


def test_num_batches_tracked_skipped_not_crash():
    """0-dim num_batches_tracked buffers from real (Sync)BN checkpoints
    must be reported unmatched, not KeyError the whole load — including
    the ResNeSt SplAt bn0/bn1 branches."""
    tr = functools.partial(translate_d2_key, frozen_bn=False)
    for key in (
        "backbone.bottom_up.res2.0.conv2.bn0.num_batches_tracked",
        "backbone.bottom_up.res2.0.conv2.bn1.num_batches_tracked",
        "backbone.bottom_up.res2.0.conv1.norm.num_batches_tracked",
    ):
        assert tr(key) is None, key

    state = {
        "backbone.bottom_up.res2.0.conv2.bn1.num_batches_tracked":
            np.zeros((), np.int64),
        "backbone.bottom_up.res2.0.conv2.fc1.weight":
            np.zeros((4, 2, 1, 1), np.float32),
    }
    out, report = state_dict_to_variables(state, translate=tr)
    assert any("num_batches_tracked" in k for k in report["unmatched"])
    assert any("fc1.weight" in k for k in report["matched"])


def test_fc1_permutation_infers_pooler_resolution():
    """A 14x14 box pooler has C*H*W divisible by 49 too — the fc1
    permutation must infer P from the checkpoint's channel widths, not
    assume 7."""
    from afigan_tpu.utils.converters import _infer_box_pool

    c, p = 256, 14
    state = {
        "proposal_generator.rpn_head.conv.weight":
            np.zeros((c, c, 3, 3), np.float32),
        "roi_heads.box_head.fc1.weight":
            np.zeros((1024, c * p * p), np.float32),
    }
    assert _infer_box_pool(state, c * p * p) == 14
    # conv box head: last conv's out-channels take precedence
    state2 = dict(state)
    state2["roi_heads.box_head.conv1.weight"] = np.zeros(
        (128, c, 3, 3), np.float32
    )
    assert _infer_box_pool(state2, 128 * 7 * 7) == 7

    # end-to-end: the permutation round-trips 14x14 correctly
    rng = np.random.RandomState(0)
    w = rng.randn(8, c * p * p).astype(np.float32)
    out, report = state_dict_to_variables(
        {"roi_heads.box_head.fc1.weight": w,
         "proposal_generator.rpn_head.conv.weight":
             np.zeros((c, c, 3, 3), np.float32)},
        translate=translate_d2_key,
    )
    k = out["params"]["roi_heads"]["box_head"]["fc1"]["kernel"]
    # torch flattens (C, P, P); ours flattens (P, P, C): entry for
    # (c0, y, x) in torch order must land at (y, x, c0) in ours
    torch_flat = w.reshape(8, c, p, p)
    ours = np.asarray(k).reshape(p, p, c, 8)
    np.testing.assert_allclose(ours[3, 5, 17], torch_flat[:, 17, 3, 5])

"""Checkpoint save/load/resume + cross-stage surgery + torch conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.engine.checkpoint import (
    extract_afi_subtree,
    latest_checkpoint,
    load_checkpoint,
    resume_or_load,
    save_checkpoint,
    transplant_generator,
)
from afigan_tpu.models import AFIGenerator, PatchDiscriminator
from afigan_tpu.utils.converters import (
    state_dict_to_variables,
    translate_d2_key,
    translate_discriminator_key,
    translate_generator_key,
)


def test_save_load_resume_roundtrip(tmp_path):
    tree = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.int32(7),
    }
    d = str(tmp_path / "G_0")
    save_checkpoint(d, "model_0000007", tree)
    assert latest_checkpoint(d).endswith("model_0000007.msgpack")
    template = {
        "params": {"w": np.zeros((2, 3), np.float32)},
        "step": np.int32(0),
    }
    loaded, resumed = resume_or_load(d, template)
    assert resumed
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])
    assert int(loaded["step"]) == 7
    _, resumed2 = resume_or_load(str(tmp_path / "empty"), template)
    assert not resumed2


def _gen_params(c=16, g=8, n=1, seed=0):
    model = AFIGenerator(in_channels=c, n_rdb=n, growth_rate=g)
    x = jnp.zeros((1, 8, 8, c))
    return model, model.init(jax.random.PRNGKey(seed), x)["params"]


def test_surgery_transplant_and_extract():
    """stage1 G → detector srf_module → stage3 extraction (ref checkpoint.py:78-125)."""
    from afigan_tpu.models.fpn import FPN

    model, g_params = _gen_params(seed=1)
    fpn = FPN(out_channels=16, interp="afi", afi_n_rdb=1, afi_growth_rate=8)
    feats = {
        "res2": jnp.zeros((1, 16, 16, 8)),
        "res3": jnp.zeros((1, 8, 8, 16)),
        "res4": jnp.zeros((1, 4, 4, 32)),
        "res5": jnp.zeros((1, 2, 2, 64)),
    }
    det = {"backbone": {"pyramid": fpn.init(jax.random.PRNGKey(0), feats)["params"]}}

    new_det = transplant_generator(det, g_params)
    sub = new_det["backbone"]["pyramid"]["srf_module"]
    np.testing.assert_array_equal(
        np.asarray(sub["generators_0/head"]["conv"]["kernel"]),
        np.asarray(g_params["generators_0/head"]["conv"]["kernel"]),
    )
    # original untouched (functional surgery)
    assert not np.array_equal(
        np.asarray(det["backbone"]["pyramid"]["srf_module"]["generators_0/head"]["conv"]["kernel"]),
        np.asarray(g_params["generators_0/head"]["conv"]["kernel"]),
    )
    # stage-3 extraction gets back exactly the transplanted subtree
    extracted = extract_afi_subtree(new_det)
    np.testing.assert_array_equal(
        np.asarray(extracted["generators_0/tail"]["conv"]["kernel"]),
        np.asarray(g_params["generators_0/tail"]["conv"]["kernel"]),
    )


def test_surgery_shape_mismatch_raises():
    _, g16 = _gen_params(c=16, g=8)
    _, g32 = _gen_params(c=32, g=8)
    det = {"backbone": {"srf_module": g16}}
    with pytest.raises(ValueError):
        transplant_generator(det, g32)


def test_torch_generator_checkpoint_converts_and_matches():
    """Full loop: torch G state dict → our params → identical outputs."""
    import torch
    from tests.test_afi_generator import TorchGenerator, _t2j_conv

    torch.manual_seed(0)
    C, G, N = 16, 8, 2
    tm = TorchGenerator(C, G, N)
    # name the state dict the way the reference's G checkpoints are named
    sd = {}
    seq = {"head": "0.0.0", "mid": "0.2.0", "up": "0.3.0", "tail": "0.4.0"}
    sd[f"Generators.{seq['head']}.weight"] = tm.head.weight.detach().numpy()
    sd[f"Generators.{seq['head']}.bias"] = tm.head.bias.detach().numpy()
    sd[f"Generators.{seq['mid']}.weight"] = tm.mid.weight.detach().numpy()
    sd[f"Generators.{seq['mid']}.bias"] = tm.mid.bias.detach().numpy()
    sd[f"Generators.{seq['up']}.weight"] = tm.up.weight.detach().numpy()
    sd[f"Generators.{seq['up']}.bias"] = tm.up.bias.detach().numpy()
    sd[f"Generators.{seq['tail']}.weight"] = tm.tail.weight.detach().numpy()
    sd[f"Generators.{seq['tail']}.bias"] = tm.tail.bias.detach().numpy()
    for i, rdb in enumerate(tm.rdbs):
        for j, conv in enumerate(rdb.convs):
            sd[f"Generators.0.1.RDBs.{i}.conv{j+1}.0.weight"] = conv.weight.detach().numpy()
        sd[f"Generators.0.1.RDBs.{i}.conv5.weight"] = rdb.conv5.weight.detach().numpy()

    model = AFIGenerator(in_channels=C, n_rdb=N, growth_rate=G)
    x = np.random.RandomState(0).randn(1, 8, 8, C).astype(np.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    variables, report = state_dict_to_variables(
        sd, template, translate=translate_generator_key
    )
    assert not report["unmatched"], report["unmatched"]
    assert not report["mismatched"], report["mismatched"]

    got = model.apply({"params": variables["params"]}, jnp.asarray(x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-3)


def test_d2_detector_key_translation_covers_template():
    """Every array of a synthetic d2-style Mask R-CNN state dict must land
    in our Mask R-CNN R-50-FPN template with the right shape."""
    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    model = build_model(cfg, train=False)
    template = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 3)), jnp.asarray([[64, 64]], jnp.int32),
        )
    )()

    # build a synthetic d2 state dict by INVERTING our template paths
    sd = {}
    sd["backbone.bottom_up.stem.conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    sd["backbone.bottom_up.stem.conv1.norm.weight"] = np.zeros(64, np.float32)
    sd["backbone.bottom_up.stem.conv1.norm.running_var"] = np.ones(64, np.float32)
    sd["backbone.bottom_up.res2.0.conv1.weight"] = np.zeros((64, 64, 1, 1), np.float32)
    sd["backbone.bottom_up.res2.0.shortcut.weight"] = np.zeros((256, 64, 1, 1), np.float32)
    sd["backbone.fpn_lateral2.weight"] = np.zeros((256, 256, 1, 1), np.float32)
    sd["backbone.fpn_lateral2.bias"] = np.zeros(256, np.float32)
    sd["backbone.srf_module.Generators.0.0.0.weight"] = np.zeros((256, 256, 3, 3), np.float32)
    sd["backbone.srf_module.Generators.0.1.RDBs.2.conv5.weight"] = np.zeros(
        (256, 256 + 4 * 32, 3, 3), np.float32
    )
    sd["backbone.srf_module.Generators.0.3.0.weight"] = np.zeros((256, 256, 6, 6), np.float32)
    sd["proposal_generator.rpn_head.conv.weight"] = np.zeros((256, 256, 3, 3), np.float32)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = np.zeros(
        (3, 256, 1, 1), np.float32
    )
    sd["roi_heads.box_head.fc1.weight"] = np.zeros((1024, 256 * 49), np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = np.zeros((81, 1024), np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(320, np.float32)
    sd["roi_heads.mask_head.mask_fcn1.weight"] = np.zeros((256, 256, 3, 3), np.float32)
    sd["roi_heads.mask_head.deconv.weight"] = np.zeros((256, 256, 2, 2), np.float32)
    sd["roi_heads.mask_head.predictor.weight"] = np.zeros((80, 256, 1, 1), np.float32)

    variables, report = state_dict_to_variables(sd, template, translate_d2_key)
    assert not report["unmatched"], report["unmatched"]
    assert not report["mismatched"], report["mismatched"]


def test_discriminator_key_translation():
    model = PatchDiscriminator(in_channels=16)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))
    sd = {
        "Discriminators.0.0.0.weight": np.zeros((32, 16, 3, 3), np.float32),
        "Discriminators.0.0.0.bias": np.zeros(32, np.float32),
        "Discriminators.0.0.0.norm.weight": np.zeros(32, np.float32),
        "Discriminators.0.0.0.norm.running_mean": np.zeros(32, np.float32),
        "Discriminators.0.3.0.weight": np.zeros((1, 64, 3, 3), np.float32),
        "Discriminators.0.3.0.bias": np.zeros(1, np.float32),
    }
    variables, report = state_dict_to_variables(
        sd, template, translate=translate_discriminator_key
    )
    assert not report["unmatched"], report["unmatched"]
    assert not report["mismatched"], report["mismatched"]
    assert "batch_stats" in variables


def test_transplant_rejects_partial_generator_tree():
    """The transplant REPLACES the srf_module subtree wholesale, so a
    source missing leaves (older/partial save) must be rejected at
    transplant time, not fail at the first apply far from the load."""
    import jax.numpy as jnp

    det = {
        "backbone": {
            "pyramid": {
                "srf_module": {
                    "generators_0/head": {"conv": {
                        "kernel": jnp.ones((3, 3, 4, 4)),
                        "bias": jnp.zeros(4),
                    }},
                    "generators_0/tail": {"conv": {
                        "kernel": jnp.ones((3, 3, 4, 4)),
                        "bias": jnp.zeros(4),
                    }},
                },
            },
        },
    }
    partial = {
        "generators_0/head": {"conv": {
            "kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.zeros(4),
        }},
        # tail missing
    }
    with pytest.raises(KeyError, match="missing from the transplanted"):
        transplant_generator(det, partial)

"""Config system tests: yacs semantics + reference YAML zoo loads verbatim."""

import glob
import os

import pytest

from afigan_tpu.config import get_cfg

REF_CONFIGS = "/root/reference/configs"


def test_defaults_and_freeze():
    cfg = get_cfg()
    assert cfg.MODEL.FPN.OUT_CHANNELS == 256
    cfg.MODEL.FPN.OUT_CHANNELS = 128
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg2 = cfg.clone()
    cfg2.MODEL.FPN.OUT_CHANNELS = 64  # clone defrosts


def test_merge_from_list_literal_eval():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.STEPS", "(100, 200)", "SOLVER.BASE_LR", "0.5"])
    assert tuple(cfg.SOLVER.STEPS) == (100, 200)
    assert cfg.SOLVER.BASE_LR == 0.5


def test_merge_rejects_unknown_key():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOT_A_KEY", "1"])


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
@pytest.mark.parametrize(
    "yaml_path",
    sorted(glob.glob(os.path.join(REF_CONFIGS, "**", "*.yaml"), recursive=True)),
    ids=lambda p: os.path.relpath(p, REF_CONFIGS),
)
def test_reference_yaml_zoo_loads(yaml_path):
    cfg = get_cfg()
    cfg.merge_from_file(yaml_path)
    cfg.freeze()
    # string tuples must have been literal_eval'd
    assert isinstance(cfg.DATASETS.TRAIN, (tuple, list))
    if "AFIGAN" in open(yaml_path).read() or "sr_backbone" in open(yaml_path).read():
        assert "sr" in cfg.MODEL.BACKBONE.NAME or cfg.MODEL.BACKBONE.NAME


def test_base_inheritance_overrides():
    cfg = get_cfg()
    path = os.path.join(
        REF_CONFIGS, "step2_af_extractor_training",
        "step2_AF-Extractor_training_mask_rcnn_R_50_FPN_1x.yaml",
    )
    if not os.path.isfile(path):
        pytest.skip("reference not mounted")
    cfg.merge_from_file(path)
    # from child
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    assert cfg.MODEL.ANCHOR_GENERATOR.SIZES == [[16], [32], [64], [128], [256]]
    # inherited from _BASE_ (Base-RCNN-FPN-AFIGAN.yaml)
    assert cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_sr_backbone"
    assert cfg.MODEL.ROI_HEADS.NAME == "StandardROIHeads"

"""Checkpoint FILE loading: d2-zoo pkl, Caffe2 ImageNet pkl, torch pth."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.engine.weights import load_weights
from afigan_tpu.models import build_resnet
from afigan_tpu.config import get_cfg
from afigan_tpu.utils.converters import load_state_dict


def _resnet_template():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    model = build_resnet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return {"params": {"backbone": {"bottom_up": variables["params"]}}}


def test_d2_zoo_pkl_loads(tmp_path):
    """d2 model-zoo format: {"model": {...}, "__author__": ...} numpy arrays."""
    rng = np.random.RandomState(0)
    stem_w = rng.randn(64, 3, 7, 7).astype(np.float32)
    sd = {
        "model": {
            "backbone.bottom_up.stem.conv1.weight": stem_w,
            "backbone.bottom_up.stem.conv1.norm.weight": np.ones(64, np.float32),
            "backbone.bottom_up.stem.conv1.norm.running_mean": np.zeros(64, np.float32),
        },
        "__author__": "Detectron2 Model Zoo",
    }
    path = str(tmp_path / "zoo.pkl")
    with open(path, "wb") as f:
        pickle.dump(sd, f)

    template = _resnet_template()
    loaded = load_weights(path, template, kind="detector")
    got = np.asarray(
        loaded["params"]["backbone"]["bottom_up"]["stem"]["conv1"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(got, stem_w.transpose(2, 3, 1, 0), rtol=1e-6)


def test_caffe2_imagenet_pkl_loads(tmp_path):
    """Caffe2 naming (conv1_w, res2_0_branch2a_w, ...) + backbone prefixing."""
    rng = np.random.RandomState(1)
    sd = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": np.ones(64, np.float32),
        "res_conv1_bn_b": np.zeros(64, np.float32),
        "res2_0_branch2a_w": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": np.ones(64, np.float32),
        "res2_0_branch1_w": rng.randn(256, 64, 1, 1).astype(np.float32),
        "conv1_w_momentum": np.zeros(1, np.float32),  # must be stripped
    }
    path = str(tmp_path / "R-50.pkl")
    with open(path, "wb") as f:
        pickle.dump({"blobs": sd}, f)

    state = load_state_dict(path)
    assert "stem.conv1.weight" in state
    assert "res2.0.conv1.weight" in state
    assert "res2.0.shortcut.weight" in state
    assert not any(k.endswith("_momentum") for k in state)

    template = _resnet_template()
    loaded = load_weights(path, template, kind="detector",
                          imagenet_backbone_only=True)
    got = np.asarray(
        loaded["params"]["backbone"]["bottom_up"]["res2/block0"]["conv1"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(
        got, sd["res2_0_branch2a_w"].transpose(2, 3, 1, 0), rtol=1e-6
    )


def test_torch_pth_state_dict_loads(tmp_path):
    """torch.save'd {"model": state_dict} (the stage-1 G_0 output format)."""
    import torch

    from afigan_tpu.models.afi import AFIGenerator

    w = torch.randn(16, 16, 3, 3)
    sd = {"model": {"Generators.0.0.0.weight": w,
                    "Generators.0.0.0.bias": torch.zeros(16)}}
    path = str(tmp_path / "g.pth")
    torch.save(sd, path)

    model = AFIGenerator(in_channels=16, n_rdb=1, growth_rate=8)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))
    loaded = load_weights(path, template, kind="generator")
    got = np.asarray(loaded["params"]["generators_0/head"]["conv"]["kernel"])
    np.testing.assert_allclose(got, w.numpy().transpose(2, 3, 1, 0), rtol=1e-6)

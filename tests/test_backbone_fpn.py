"""ResNet + FPN smoke/shape tests (incl. AFI top-down path)."""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.models.resnet import ResNet
from afigan_tpu.models.fpn import FPN


def test_resnet50_shapes():
    model = ResNet(depth=50, norm="FrozenBN")
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["res2"].shape == (1, 16, 16, 256)
    assert out["res3"].shape == (1, 8, 8, 512)
    assert out["res4"].shape == (1, 4, 4, 1024)
    assert out["res5"].shape == (1, 2, 2, 2048)
    # param count sanity: R50 backbone ≈ 23.5M params
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 23e6 < n < 27e6, n


def _fake_bottom_up(b=1, h=32, w=32):
    return {
        "res2": jnp.asarray(np.random.RandomState(0).randn(b, h, w, 8), jnp.float32),
        "res3": jnp.asarray(np.random.RandomState(1).randn(b, h // 2, w // 2, 16), jnp.float32),
        "res4": jnp.asarray(np.random.RandomState(2).randn(b, h // 4, w // 4, 32), jnp.float32),
        "res5": jnp.asarray(np.random.RandomState(3).randn(b, h // 8, w // 8, 64), jnp.float32),
    }


def test_fpn_nearest_shapes():
    fpn = FPN(out_channels=32, interp="nearest", afi_n_rdb=1)
    feats = _fake_bottom_up()
    params = fpn.init(jax.random.PRNGKey(0), feats)["params"]
    out = fpn.apply({"params": params}, feats)
    assert set(out) == {"p2", "p3", "p4", "p5", "p6"}
    assert out["p2"].shape == (1, 32, 32, 32)
    assert out["p6"].shape == (1, 2, 2, 32)
    assert "srf_module" not in params


def test_fpn_afi_has_shared_srf_module():
    fpn = FPN(out_channels=32, interp="afi", afi_n_rdb=1, afi_growth_rate=8)
    feats = _fake_bottom_up()
    params = fpn.init(jax.random.PRNGKey(0), feats)["params"]
    assert "srf_module" in params  # single shared generator (ref fpn_sr.py:65)
    out = fpn.apply({"params": params}, feats)
    assert out["p2"].shape == (1, 32, 32, 32)


def test_fpn_p6p7_top_block():
    fpn = FPN(
        in_features=("res3", "res4", "res5"),
        in_strides=(8, 16, 32),
        out_channels=32,
        interp="nearest",
        top_block="p6p7",
        top_block_in_feature="p5",
    )
    feats = _fake_bottom_up()
    params = fpn.init(jax.random.PRNGKey(0), feats)["params"]
    out = fpn.apply({"params": params}, feats)
    assert set(out) == {"p3", "p4", "p5", "p6", "p7"}
    assert out["p7"].shape == (1, 1, 1, 32)


def test_resnet18_basicblock():
    """R-18/34 build with BasicBlock (two 3x3 convs, channels 64..512) —
    previously these depths silently built bottleneck stages matching no
    torch checkpoint."""
    import jax
    import jax.numpy as jnp
    from afigan_tpu.models.resnet import ResNet

    net = ResNet(depth=18, res2_out_channels=64, norm="FrozenBN")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vars_, x)
    assert out["res2"].shape == (1, 16, 16, 64)
    assert out["res5"].shape == (1, 2, 2, 512)
    blk = vars_["params"]["res2/block0"]
    assert set(blk) == {"conv1", "conv2"}  # no conv3, no shortcut at res2/0
    # conv1 is a 3x3 (not the bottleneck 1x1)
    assert blk["conv1"]["conv"]["kernel"].shape[:2] == (3, 3)
    # res3/block0 downsamples -> projection shortcut exists
    assert "shortcut" in vars_["params"]["res3/block0"]


def test_group_norm_uses_torch_epsilon():
    """get_norm('GN') must use torch's eps=1e-5 (flax defaults to 1e-6)."""
    from afigan_tpu.models.layers import get_norm

    gn = get_norm("GN", 32)
    assert gn.epsilon == 1e-5


def test_conv_transpose_generic_padding_shape():
    """k=4,s=2,p=0 (out = 2h+2, torch semantics) must take the generic
    path — the phase decomposition only covers k == 2p+2 (out = 2h)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from afigan_tpu.models.layers import ConvTranspose

    x = np.random.RandomState(0).randn(1, 5, 6, 3).astype(np.float32)
    m = ConvTranspose(4, kernel_size=4, stride=2, padding=0)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(vars_, jnp.asarray(x))
    assert y.shape == (1, 12, 14, 4)  # (h-1)*2 + 4 = 2h+2

    # numeric parity vs torch for the generic path
    tm = torch.nn.ConvTranspose2d(3, 4, 4, stride=2, padding=0)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(vars_["params"]["kernel"]), (2, 3, 0, 1))
        ))
        tm.bias.copy_(torch.from_numpy(np.asarray(vars_["params"]["bias"])))
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )

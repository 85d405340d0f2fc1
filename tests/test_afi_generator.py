"""AFI generator/discriminator numerics parity vs torch re-implementation.

The torch model below is written from the architecture spec (SURVEY §2.1
#1-2: dense blocks with growth 32, residual scale 0.2, convtranspose
k6/s2/p2, bilinear x2 skip), NOT copied from the reference. Weights are
generated in torch and mapped into our flax param tree; outputs must match
to fp32 tolerance. This pins down conv padding, convtranspose semantics,
bilinear align_corners=False, and leaky-relu slopes all at once.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as torch_nn
import torch.nn.functional as torch_F

from afigan_tpu.models.afi import AFIGenerator, PatchDiscriminator


class TorchRDB(torch_nn.Module):
    def __init__(self, c=32, g=16, scale=0.2):
        super().__init__()
        self.scale = scale
        self.convs = torch_nn.ModuleList(
            [torch_nn.Conv2d(c + i * g, g, 3, 1, 1, bias=False) for i in range(4)]
        )
        self.conv5 = torch_nn.Conv2d(c + 4 * g, c, 3, 1, 1, bias=False)

    def forward(self, x):
        feats = [x]
        for conv in self.convs:
            feats.append(torch_F.leaky_relu(conv(torch.cat(feats, 1)), 0.2))
        out = self.conv5(torch.cat(feats, 1))
        return x + out * self.scale


class TorchGenerator(torch_nn.Module):
    def __init__(self, c=32, g=16, n_rdb=2, scale=0.2):
        super().__init__()
        self.scale = scale
        self.head = torch_nn.Conv2d(c, c, 3, 1, 1)
        self.rdbs = torch_nn.ModuleList([TorchRDB(c, g, scale) for _ in range(n_rdb)])
        self.mid = torch_nn.Conv2d(c, c, 3, 1, 1)
        self.up = torch_nn.ConvTranspose2d(c, c, 6, 2, 2)
        self.tail = torch_nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        skip = torch_F.interpolate(x, scale_factor=2, mode="bilinear")
        y = torch_F.leaky_relu(self.head(x), 0.2)
        rir_in = y
        for rdb in self.rdbs:
            y = rdb(y)
        y = rir_in + y * self.scale
        y = torch_F.leaky_relu(self.mid(y), 0.2)
        y = torch_F.leaky_relu(self.up(y), 0.2)
        y = self.tail(y)
        return y + skip


def _t2j_conv(w):  # torch OIHW -> flax HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _t2j_deconv(w):  # torch ConvTranspose IOHW -> our HWIO (in, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 0, 1))


def test_generator_matches_torch():
    torch.manual_seed(0)
    C, G, NRDB = 32, 16, 2
    tm = TorchGenerator(C, G, NRDB)
    tm.eval()

    model = AFIGenerator(in_channels=C, n_rdb=NRDB, growth_rate=G)
    x = np.random.RandomState(0).randn(2, 8, 10, C).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    # map torch weights into the flax tree
    p = params
    def setconv(dst, conv, bias=True):
        dst["conv"]["kernel"] = _t2j_conv(conv.weight)
        if bias:
            dst["conv"]["bias"] = jnp.asarray(conv.bias.detach().numpy())

    setconv(p["generators_0/head"], tm.head)
    setconv(p["generators_0/mid"], tm.mid)
    setconv(p["generators_0/tail"], tm.tail)
    p["generators_0/up"]["kernel"] = _t2j_deconv(tm.up.weight)
    p["generators_0/up"]["bias"] = jnp.asarray(tm.up.bias.detach().numpy())
    rir = p["generators_0/rir"]
    for i, rdb in enumerate(tm.rdbs):
        dst = rir[f"rdb{i}"]
        for j, conv in enumerate(rdb.convs):
            dst[f"conv{j+1}"]["conv"]["kernel"] = _t2j_conv(conv.weight)
        dst["conv5"]["conv"]["kernel"] = _t2j_conv(rdb.conv5.weight)

    got = model.apply({"params": p}, jnp.asarray(x))  # NHWC
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert got.shape == (2, 16, 20, C)
    # fp32 accumulation noise across ~17 chained convs; abs tolerance only
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-3)


def test_generator_init_scale():
    """kaiming x0.1 init → tiny generator output ≈ bilinear skip at init."""
    model = AFIGenerator(in_channels=16, n_rdb=1, growth_rate=8)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    skip = jax.image.resize(x, (1, 16, 16, 16), "linear")
    # residual branch should be small relative to the skip at init
    resid = np.abs(np.asarray(out - skip)).mean()
    base = np.abs(np.asarray(skip)).mean()
    assert resid < 0.2 * base


def test_discriminator_shapes_and_train_stats():
    model = PatchDiscriminator(in_channels=32, train=True)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 1)
    assert "batch_stats" in mutated
    # eval mode uses running stats, no mutation needed
    ev = PatchDiscriminator(in_channels=32, train=False)
    out2 = ev.apply(variables, x)
    assert out2.shape == (2, 16, 16, 1)

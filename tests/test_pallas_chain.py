"""Fused generator-chain Pallas kernel vs the flax modules (interpret
mode on CPU — same program as the TPU compile, minus Mosaic codegen)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.models.afi.generator import AFIGenerator
from afigan_tpu.ops.pallas import fused_generator_chain


def _chain_weights(params):
    rir = params["generators_0/rir"]
    return (
        params["generators_0/head"]["conv"]["kernel"],
        params["generators_0/head"]["conv"]["bias"],
        [
            [rir[f"rdb{i}"][f"conv{j}"]["conv"]["kernel"] for j in range(1, 6)]
            for i in range(3)
        ],
    )


def _flax_chain(params, x):
    """head + RiR through the unfused flax modules (the chain kernel's
    reference): run the full generator graph but capture the RiR output
    by recomputing head → rir with the module's own submodule params."""
    from afigan_tpu.models.afi.generator import ResidualInResidual
    from afigan_tpu.models.layers import Conv, leaky_relu02

    head = Conv(x.shape[-1], 3, padding=1, name="head")
    y = leaky_relu02(
        head.apply({"params": params["generators_0/head"]}, x)
    )
    rir = ResidualInResidual(3, 8, 0.2)
    return rir.apply({"params": params["generators_0/rir"]}, y)


@pytest.mark.parametrize("hw,tile", [((16, 16), 16), ((24, 40), 16), ((13, 18), 8)])
def test_fused_chain_matches_flax(hw, tile):
    h, w = hw
    c = 32
    model = AFIGenerator(in_channels=c, n_rdb=3, growth_rate=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, h, w, c).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    head_w, head_b, rdb_ws = _chain_weights(params)
    want = _flax_chain(params, x)
    got = fused_generator_chain(
        x, head_w, head_b, rdb_ws, 0.2, tile=tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_generator_two_kernel_pipeline_matches_unfused():
    """The whole generator with fused=True (chain + upsample kernels)
    must equal the unfused flax path end to end."""
    c = 32
    x = jnp.asarray(np.random.RandomState(3).randn(1, 14, 22, c).astype(np.float32))
    unfused = AFIGenerator(in_channels=c, n_rdb=3, growth_rate=8)
    params = unfused.init(jax.random.PRNGKey(0), x)["params"]
    want = unfused.apply({"params": params}, x)
    fused = AFIGenerator(in_channels=c, n_rdb=3, growth_rate=8, fused=True)
    got = fused.apply({"params": params}, x)
    assert got.shape == (1, 28, 44, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()),
    reason="compiled Mosaic parity needs a real TPU (tests pin CPU)",
)
def test_fused_chain_compiled_matches_flax_tpu():
    """Compiled (Mosaic) parity at the production shape. Run manually:
    env -u JAX_PLATFORMS python -m pytest tests/test_pallas_chain.py -k compiled
    """
    c = 256
    model = AFIGenerator(in_channels=c, n_rdb=3, growth_rate=32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 50, 84, c).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    head_w, head_b, rdb_ws = _chain_weights(params)
    want = _flax_chain(params, x)
    got = fused_generator_chain(x, head_w, head_b, rdb_ws, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

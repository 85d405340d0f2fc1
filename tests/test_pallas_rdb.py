"""Fused RDB Pallas kernel vs the flax reference module (interpret mode).

On CPU the kernel runs through the Pallas interpreter — same program,
same numerics path as the TPU compile (minus Mosaic codegen).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from afigan_tpu.models.afi.generator import ResidualDenseBlock
from afigan_tpu.ops.pallas import fused_rdb


def _weights_from_params(params):
    return [params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]


@pytest.mark.parametrize("hw,tile", [((16, 16), 16), ((24, 40), 16), ((13, 18), 8)])
def test_fused_rdb_matches_flax(hw, tile):
    h, w = hw
    c, g = 32, 8
    model = ResidualDenseBlock(growth_rate=g, residual_scale=0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, h, w, c).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    want = model.apply({"params": params}, x)
    got = fused_rdb(x, _weights_from_params(params), 0.2, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_rdb_tile_edges_zero_padded():
    """Border behavior must equal padding=1 convs (zeros outside image)."""
    c, g = 16, 8
    model = ResidualDenseBlock(growth_rate=g, residual_scale=0.2)
    x = jnp.asarray(np.ones((1, 9, 9, c), np.float32))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    want = model.apply({"params": params}, x)
    got = fused_rdb(x, _weights_from_params(params), 0.2, tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()),
    reason="compiled Mosaic parity needs a real TPU (tests pin CPU)",
)
def test_fused_rdb_compiled_matches_flax_tpu():
    """Compiled (Mosaic, not interpret) parity on the real chip at the
    production shape (C=256, G=32). Run manually with:
    env -u JAX_PLATFORMS python -m pytest tests/test_pallas_rdb.py -k compiled
    (the suite's conftest pins CPU, where this auto-skips)."""
    c, g = 256, 32
    model = ResidualDenseBlock(growth_rate=g, residual_scale=0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 50, 84, c).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    want = model.apply({"params": params}, x)
    got = fused_rdb(x, _weights_from_params(params), 0.2, tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)

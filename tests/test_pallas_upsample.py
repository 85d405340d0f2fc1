"""Fused conv-upsample Pallas kernel vs the unfused generator tail
(interpret mode on CPU; same program Mosaic compiles on TPU).

The reference chain (ref generator_rdb.py:123-130):
    mid conv3x3 + LReLU -> ConvTranspose(6,2,2) + LReLU -> tail conv3x3
    -> + bilinear x2 skip
built here from the SAME flax layers the AFIGenerator uses, so parity
covers the torch-matching Conv/ConvTranspose semantics too.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from afigan_tpu.models.layers import (
    Conv,
    ConvTranspose,
    bilinear_upsample_x2,
    leaky_relu02,
)
from afigan_tpu.ops.pallas import fused_upsample


class _Tail(nn.Module):
    c: int

    @nn.compact
    def __call__(self, r, x):
        y = leaky_relu02(Conv(self.c, 3, padding=1, name="mid")(r))
        y = leaky_relu02(ConvTranspose(self.c, 6, 2, 2, name="up")(y))
        y = Conv(self.c, 3, padding=1, name="tail")(y)
        return y + bilinear_upsample_x2(x)


def _run(params, r, x, tile):
    p = params
    return fused_upsample(
        r, x,
        p["mid"]["conv"]["kernel"], p["mid"]["conv"]["bias"],
        p["up"]["kernel"], p["up"]["bias"],
        p["tail"]["conv"]["kernel"], p["tail"]["conv"]["bias"],
        tile=tile, interpret=True,
    )


@pytest.mark.parametrize("hw,tile", [((16, 16), 16), ((24, 40), 16), ((13, 18), 8)])
def test_fused_upsample_matches_unfused(hw, tile):
    h, w = hw
    c = 32
    model = _Tail(c)
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), r, x)
    want = model.apply(variables, r, x)
    got = _run(variables["params"], r, x, tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_generator_fused_end_to_end_matches_unfused():
    """AFIGenerator(fused=True) — Pallas RDB chain + conv-upsample —
    must reproduce the unfused module exactly from the SAME params
    (the fused path reads the unfused init's param tree)."""
    from afigan_tpu.models.afi.generator import AFIGenerator

    c = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 24, c).astype(np.float32))
    unfused = AFIGenerator(in_channels=c, n_rdb=2, growth_rate=8)
    fused = AFIGenerator(in_channels=c, n_rdb=2, growth_rate=8, fused=True)
    variables = unfused.init(jax.random.PRNGKey(0), x)
    want = unfused.apply(variables, x)
    got = fused.apply(variables, x)
    assert want.shape == got.shape == (1, 32, 48, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_upsample_border_semantics():
    """Conv zero-padding + bilinear edge clamp must match at image borders
    (constant input makes any border mishandling visible)."""
    c = 16
    model = _Tail(c)
    r = jnp.ones((1, 9, 11, c), np.float32)
    x = jnp.full((1, 9, 11, c), 0.5, np.float32)
    variables = model.init(jax.random.PRNGKey(1), r, x)
    want = model.apply(variables, r, x)
    got = _run(variables["params"], r, x, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

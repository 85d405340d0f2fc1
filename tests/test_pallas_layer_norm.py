"""Parity tests for the fused Pallas LayerNorm (ops/pallas/layer_norm.py)
and its jnp twin (models/swin.py::FusedLayerNorm)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from afigan_tpu.models.swin import FusedLayerNorm
from afigan_tpu.ops.pallas.layer_norm import fused_layer_norm


def _flax_ln(x, scale, bias, eps=1e-5):
    mod = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias}}
    return mod.apply(variables, x.astype(jnp.float32))


@pytest.mark.parametrize(
    "shape",
    [(4, 28, 44, 192), (2, 7, 11, 96), (5, 3, 256), (1024, 129)],
)
def test_kernel_matches_flax_layernorm(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 3 + 1, jnp.float32)
    c = shape[-1]
    scale = jnp.asarray(rng.randn(c) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    got = fused_layer_norm(x, scale, bias, eps=1e-5, interpret=True)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_module_jnp_path_matches_flax_layernorm_exactly():
    """The xla path of FusedLayerNorm reproduces nn.LayerNorm op-for-op
    (it replaced nn.LayerNorm at every Swin site; golden/torch-parity
    values must not move)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 14, 22, 96), jnp.float32)
    scale = jnp.asarray(rng.randn(96) + 1, jnp.float32)
    bias = jnp.asarray(rng.randn(96), jnp.float32)
    mod = FusedLayerNorm(out_dtype=jnp.float32)
    got = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_module_param_tree_matches_nn_layernorm():
    """Checkpoint compatibility: same {scale, bias} leaves, same shapes."""
    x = jnp.zeros((2, 4, 4, 32))
    v_new = FusedLayerNorm().init(jax.random.PRNGKey(0), x)
    v_old = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    assert set(v_new["params"]) == set(v_old["params"]) == {"scale", "bias"}
    for k in ("scale", "bias"):
        assert v_new["params"][k].shape == v_old["params"][k].shape


def test_kernel_prime_row_count_pads_instead_of_degenerate_grid():
    """R = 7993 (prime) has no divisor <= 1024; the kernel must pad rows
    to a block multiple rather than fall back to an R-step grid
    (round-3 ADVICE #2) — and stay exact."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(7993, 64) * 2, jnp.float32)
    scale = jnp.asarray(rng.randn(64) + 1, jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)
    got = fused_layer_norm(x, scale, bias, interpret=True)
    assert got.shape == x.shape
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_bf16_io():
    rng = np.random.RandomState(2)
    x32 = jnp.asarray(rng.randn(8, 16, 192), jnp.float32)
    scale = jnp.ones((192,), jnp.float32)
    bias = jnp.zeros((192,), jnp.float32)
    got = fused_layer_norm(x32.astype(jnp.bfloat16), scale, bias,
                           out_dtype=jnp.bfloat16, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _flax_ln(x32, scale, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.03, atol=0.03)

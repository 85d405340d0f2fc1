"""Gating tests for TPU.SWIN_ATTN_IMPL / TPU.SWIN_LN_IMPL (round-3
ADVICE #1 + the round-4 independent-LN A/B knob)."""

import jax
import jax.numpy as jnp
import pytest

from afigan_tpu.models.swin import SwinTransformer


def _tiny(**kw):
    return SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(2, 2),
                           window_size=4, out_features=("stage2", "stage3"),
                           **kw)


def test_forced_pallas_with_train_raises():
    m = _tiny(train=True, attn_impl="pallas")
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="inference-only"):
        m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)


def test_forced_pallas_ln_with_train_raises():
    m = _tiny(train=True, attn_impl="xla", ln_impl="pallas")
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="inference-only"):
        m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)


def test_auto_train_downgrades_and_runs():
    m = _tiny(train=True, attn_impl="auto", ln_impl="auto")
    x = jnp.ones((1, 16, 16, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    out = m.apply(v, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(out) == {"stage2", "stage3"}


def test_ln_impl_forced_pallas_inference_matches_xla():
    """ln_impl is an independent gate: forcing pallas LN (interpret on
    CPU) with xla attention must reproduce the all-xla output."""
    x = jnp.asarray(jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3)))
    m_x = _tiny(train=False, attn_impl="xla", ln_impl="xla")
    v = m_x.init({"params": jax.random.PRNGKey(0)}, x)
    m_p = _tiny(train=False, attn_impl="xla", ln_impl="pallas")
    out_x = m_x.apply(v, x)
    out_p = m_p.apply(v, x)
    for k in out_x:
        assert jnp.allclose(out_x[k], out_p[k], rtol=1e-5, atol=1e-5), k

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


def test_qkv_headmajor_matches_split():
    """TPU.SWIN_QKV_LAYOUT='headmajor' is a pure contraction-order
    restructure (heads ride as an einsum batch dim instead of explicit
    head-split transposes) — identical params, near-identical f32 math
    on both the shifted (masked) and unshifted blocks."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
    m_split = _tiny(qkv_layout="split")
    m_hm = _tiny(qkv_layout="headmajor")
    v = m_split.init({"params": jax.random.PRNGKey(0)}, x)
    out_s = m_split.apply(v, x)
    out_h = m_hm.apply(v, x)  # same param tree: layout changes no params
    for k in out_s:
        assert jnp.allclose(out_s[k], out_h[k], atol=1e-5), k


def test_bf16_scores_close_to_f32():
    """TPU.SWIN_SCORES_DTYPE='bfloat16' keeps the (n, n) score tensor in
    bf16 through bias-add/softmax; outputs must stay close to the f32
    path at bf16 resolution (~1e-2 relative)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3))
    m_f32 = _tiny(qkv_layout="headmajor", scores_dtype="float32")
    m_bf16 = _tiny(qkv_layout="headmajor", scores_dtype="bfloat16")
    v = m_f32.init({"params": jax.random.PRNGKey(0)}, x)
    out_f = m_f32.apply(v, x)
    out_b = m_bf16.apply(v, x)
    for k in out_f:
        ref = jnp.abs(out_f[k]).max()
        assert jnp.abs(out_f[k] - out_b[k]).max() < 2e-2 * ref, k

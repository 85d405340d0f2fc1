"""Parity tests for the fused Pallas window-attention kernel.

The kernel (ops/pallas/window_attention.py) must match the XLA einsum +
f32-softmax reference path bit-closely in f32 (same math, different
accumulation order). Runs in interpret mode on CPU (the tests' pinned
backend), exactly like the other Pallas kernel tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afigan_tpu.ops.pallas.window_attention import fused_window_attention


def _xla_reference(q, k, v, bias, mask, scale):
    """The einsum path of models/swin.py::WindowAttention, f32."""
    bnw, nh, n, d = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    attn = attn.astype(jnp.float32) + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bnw // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(bnw, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _rand_inputs(rng, bnw, nh, n, d, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(bnw, nh, n, d), dtype)
    k = jnp.asarray(rng.randn(bnw, nh, n, d), dtype)
    v = jnp.asarray(rng.randn(bnw, nh, n, d), dtype)
    bias = jnp.asarray(rng.randn(nh, n, n) * 0.1, jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize(
    "bnw,nh,n,d",
    [
        (12, 6, 144, 32),   # production window 12x12, Swin-L stage-2-like
        (8, 4, 49, 8),      # window 7x7, unaligned sublane count
        (5, 3, 16, 16),     # wb=5 (odd divisor), tiny
    ],
)
def test_unmasked_matches_xla(bnw, nh, n, d):
    rng = np.random.RandomState(0)
    q, k, v, bias = _rand_inputs(rng, bnw, nh, n, d)
    scale = d ** -0.5
    got = fused_window_attention(q, k, v, bias, None, scale=scale,
                                 interpret=True)
    want = _xla_reference(q, k, v, bias, None, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,nw", [(2, 6), (1, 4)])
def test_masked_matches_xla(b, nw):
    """SW-MSA additive mask: window i uses mask[i % nw]."""
    nh, n, d = 4, 64, 16
    bnw = b * nw
    rng = np.random.RandomState(1)
    q, k, v, bias = _rand_inputs(rng, bnw, nh, n, d)
    # realistic mask values: 0 or -100 blocks
    mask = np.where(rng.rand(nw, n, n) > 0.5, -100.0, 0.0).astype(np.float32)
    # keep at least one unmasked entry per row so softmax is well-defined
    mask[:, :, 0] = 0.0
    mask = jnp.asarray(mask)
    scale = d ** -0.5
    got = fused_window_attention(q, k, v, bias, mask, scale=scale,
                                 interpret=True)
    want = _xla_reference(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_swin_module_pallas_equals_xla():
    """models/swin.py end-to-end: attn_impl='pallas' == 'xla' on the
    same params (covers the qkv plumbing, bias gather, shift mask)."""
    from afigan_tpu.models.swin import SwinTransformer

    x = jnp.asarray(np.random.RandomState(2).rand(1, 48, 48, 3) * 255,
                    jnp.float32)
    kw = dict(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7,
              out_features=("stage2", "stage3"), train=False)
    m_xla = SwinTransformer(attn_impl="xla", **kw)
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    out_xla = m_xla.apply(variables, x)
    m_pl = SwinTransformer(attn_impl="pallas", **kw)
    out_pl = m_pl.apply(variables, x)
    assert set(out_xla) == set(out_pl)
    for name in out_xla:
        np.testing.assert_allclose(np.asarray(out_pl[name]),
                                   np.asarray(out_xla[name]),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_runs_and_is_close():
    """bf16 I/O (the production dtype): kernel keeps f32 scores, so it
    is at least as accurate as the XLA path — compare both against the
    f32 computation with a bf16-scale tolerance."""
    bnw, nh, n, d = 6, 2, 144, 32
    rng = np.random.RandomState(3)
    qf, kf, vf, bias = _rand_inputs(rng, bnw, nh, n, d)
    scale = d ** -0.5
    want = _xla_reference(qf, kf, vf, bias, None, scale)
    got = fused_window_attention(qf.astype(jnp.bfloat16),
                                 kf.astype(jnp.bfloat16),
                                 vf.astype(jnp.bfloat16), bias, None,
                                 scale=scale, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)

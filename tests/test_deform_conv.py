"""Deformable conv tests: zero-offset equals plain conv; modulation scales."""

import numpy as np
import jax.numpy as jnp
import jax

from afigan_tpu.ops.deform_conv import deform_conv2d


def test_zero_offsets_match_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    offsets = jnp.zeros((2, 10, 12, 18))
    got = deform_conv2d(x, offsets, w, stride=1, padding=1)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_input():
    """offset (0, 1) on every tap == conv over x shifted left by 1."""
    rng = np.random.RandomState(1)
    x = np.zeros((1, 8, 8, 4), np.float32)
    x[:, :, :7] = rng.randn(1, 8, 7, 4)
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    offsets[..., 1::2] = 1.0  # dx = 1 for every tap
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), w, padding=1)
    shifted = np.zeros_like(x)
    shifted[:, :, :-1] = x[:, :, 1:]
    want = jax.lax.conv_general_dilated(
        jnp.asarray(shifted), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # all but the left border column match (at col 0 the deform op reaches
    # the real x[0] where the shifted-conv sees zero padding)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:], np.asarray(want)[:, :, 1:], rtol=1e-4, atol=1e-4
    )


def test_modulation_mask_scales_contribution():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    full = deform_conv2d(x, offsets, w, mask=jnp.ones((1, 6, 6, 9)), padding=1)
    half = deform_conv2d(x, offsets, w, mask=jnp.full((1, 6, 6, 9), 0.5), padding=1)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, rtol=1e-4)


def test_resnest_dcn_stage_builds_and_runs():
    """DEFORM_ON_PER_STAGE wires DeformConvLayer into the bottleneck; with
    zero-init offsets the block must behave like a plain conv block."""
    import jax
    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_resnest

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RADIX = 2
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [True, False, False, False]
    model = build_resnest(cfg, train=False)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "offset_conv" in variables["params"]["res2/block0"]["conv2"]
    out = model.apply(variables, x)
    assert out["res2"].shape == (1, 8, 8, 256)

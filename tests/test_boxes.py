"""Golden tests for box ops against independent torch-CPU references."""

import numpy as np
import jax.numpy as jnp
import torch

from afigan_tpu.ops import Box2BoxTransform, clip_boxes, pairwise_iou


def _random_boxes(n, seed, size=100.0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _torch_pairwise_iou(b1, b2):
    """Independent torch implementation (d2 pairwise_iou semantics)."""
    b1, b2 = torch.from_numpy(b1), torch.from_numpy(b2)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = torch.where(union > 0, inter / union, torch.zeros_like(inter))
    return iou.numpy()


def test_pairwise_iou_matches_torch():
    b1 = _random_boxes(37, 0)
    b2 = _random_boxes(53, 1)
    got = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = _torch_pairwise_iou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_identity_and_disjoint():
    b = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float32)
    iou = np.asarray(pairwise_iou(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)
    assert iou[0, 1] == 0.0


def _torch_apply_deltas(deltas, boxes, weights, scale_clamp):
    """d2 Box2BoxTransform.apply_deltas reference in torch."""
    deltas, boxes = torch.from_numpy(deltas), torch.from_numpy(boxes)
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = deltas[:, 2::4] / ww
    dh = deltas[:, 3::4] / wh
    dw = torch.clamp(dw, max=scale_clamp)
    dh = torch.clamp(dh, max=scale_clamp)
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = torch.exp(dw) * widths[:, None]
    pred_h = torch.exp(dh) * heights[:, None]
    out = torch.zeros_like(deltas)
    out[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    out[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    out[:, 2::4] = pred_ctr_x + 0.5 * pred_w
    out[:, 3::4] = pred_ctr_y + 0.5 * pred_h
    return out.numpy()


def test_box_transform_roundtrip_and_torch_parity():
    import math

    weights = (10.0, 10.0, 5.0, 5.0)
    tf = Box2BoxTransform(weights)
    src = _random_boxes(64, 2)
    tgt = _random_boxes(64, 3)
    deltas = np.asarray(tf.get_deltas(jnp.asarray(src), jnp.asarray(tgt)))
    # roundtrip: apply_deltas(get_deltas(src→tgt), src) == tgt
    rec = np.asarray(tf.apply_deltas(jnp.asarray(deltas), jnp.asarray(src)))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)
    # parity with torch impl including the scale clamp
    big = deltas.copy()
    big[:, 2:] += 10.0  # trigger clamp
    got = np.asarray(tf.apply_deltas(jnp.asarray(big), jnp.asarray(src)))
    want = _torch_apply_deltas(big, src, weights, math.log(1000.0 / 16))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 50.0, 120.0]])
    out = np.asarray(clip_boxes(b, jnp.asarray([100, 40])))
    np.testing.assert_allclose(out, [[0, 0, 40, 100]])

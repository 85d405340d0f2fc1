"""Native C++ RLE/IoU kernels vs pure-python reference implementations."""

import numpy as np
import pytest

from afigan_tpu.native import (
    get_lib,
    native_bbox_iou,
    native_counts_to_string,
    native_decode,
    native_encode_counts,
    native_rle_iou,
    native_string_to_counts,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="g++ unavailable")


def _py_encode(mask):
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    n = flat.size
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], change, [n]])).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return [int(r) for r in runs]


def test_native_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(31, 17) > 0.5).astype(np.uint8)
        counts = native_encode_counts(m)
        assert counts == _py_encode(m)
        back = native_decode(counts, 31, 17)
        np.testing.assert_array_equal(back, m)


def test_native_string_roundtrip():
    for counts in ([0, 5, 100, 3, 250, 7], [100000, 1, 99999, 2], [12]):
        s = native_counts_to_string(counts)
        assert native_string_to_counts(s) == counts


def test_native_bbox_iou_matches_numpy():
    rng = np.random.RandomState(1)
    dt = np.concatenate([rng.rand(7, 2) * 50, rng.rand(7, 2) * 30 + 1], axis=1)
    gt = np.concatenate([rng.rand(5, 2) * 50, rng.rand(5, 2) * 30 + 1], axis=1)
    crowd = np.array([0, 1, 0, 0, 1], np.uint8)
    got = native_bbox_iou(dt, gt, crowd)
    # reference
    want = np.zeros((7, 5))
    for j in range(5):
        gx1, gy1, gw, gh = gt[j]
        for i in range(7):
            dx1, dy1, dw, dh = dt[i]
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            inter = max(iw, 0) * max(ih, 0)
            uni = dw * dh if crowd[j] else dw * dh + gw * gh - inter
            want[i, j] = inter / uni if uni > 0 else 0
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_rle_iou_matches_decode():
    rng = np.random.RandomState(2)
    m1 = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    m2 = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    c1, c2 = _py_encode(m1), _py_encode(m2)
    got = native_rle_iou(c1, c2, False)
    inter = np.logical_and(m1, m2).sum()
    union = np.logical_or(m1, m2).sum()
    np.testing.assert_allclose(got, inter / union, rtol=1e-12)
    got_crowd = native_rle_iou(c1, c2, True)
    np.testing.assert_allclose(got_crowd, inter / m1.sum(), rtol=1e-12)

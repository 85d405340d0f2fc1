"""Matcher + subsample tests (d2 semantics with padded GT)."""

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.ops import Matcher, pairwise_iou, subsample_labels


def test_matcher_thresholds():
    m = Matcher([0.3, 0.7], [0, -1, 1])
    # quality rows = gt, cols = anchors
    q = jnp.asarray([[0.1, 0.5, 0.9], [0.2, 0.4, 0.95]])
    valid = jnp.asarray([True, True])
    matches, labels = m(q, valid)
    np.testing.assert_array_equal(np.asarray(labels), [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(matches), [1, 0, 1])


def test_matcher_low_quality_promotion():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    # gt0's best anchor only reaches 0.2 → promoted to fg anyway
    q = jnp.asarray([[0.2, 0.1, 0.05]])
    matches, labels = m(q, jnp.asarray([True]))
    assert int(labels[0]) == 1
    assert int(labels[1]) == 0


def test_matcher_ignores_padded_gt():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    q = jnp.asarray([[0.9, 0.0], [0.95, 0.99]])  # row 1 is padding
    matches, labels = m(q, jnp.asarray([True, False]))
    assert int(matches[0]) == 0  # must match valid gt 0, not padded gt 1
    assert int(labels[0]) == 1
    assert int(labels[1]) == 0  # anchor 1 has no valid overlap → bg


def test_subsample_counts_and_fraction():
    rng = np.random.RandomState(0)
    labels = np.zeros(1000, dtype=np.int32)
    labels[:30] = 1  # 30 positives
    labels[900:] = -1  # 100 ignore
    key = jax.random.PRNGKey(0)
    idx, valid = subsample_labels(key, jnp.asarray(labels), 256, 0.5, bg_label=0)
    idx, valid = np.asarray(idx), np.asarray(valid)
    sel = idx[valid]
    sel_labels = labels[sel]
    assert valid.sum() == 256
    assert (sel_labels == 1).sum() == 30  # all positives taken (< 128)
    assert (sel_labels == 0).sum() == 226
    assert (sel_labels == -1).sum() == 0
    assert len(np.unique(sel)) == len(sel)  # no duplicates


def test_subsample_caps_positives():
    labels = np.zeros(500, dtype=np.int32)
    labels[:300] = 1
    key = jax.random.PRNGKey(1)
    idx, valid = subsample_labels(key, jnp.asarray(labels), 128, 0.25, bg_label=0)
    sel = np.asarray(idx)[np.asarray(valid)]
    assert (labels[sel] == 1).sum() == 32  # 0.25 * 128
    assert (labels[sel] == 0).sum() == 96


def test_subsample_randomness():
    labels = np.zeros(100, dtype=np.int32)
    labels[:50] = 1
    i1, v1 = subsample_labels(jax.random.PRNGKey(0), jnp.asarray(labels), 16, 0.5)
    i2, v2 = subsample_labels(jax.random.PRNGKey(7), jnp.asarray(labels), 16, 0.5)
    assert not np.array_equal(np.asarray(i1), np.asarray(i2))

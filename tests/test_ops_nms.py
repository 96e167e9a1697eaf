"""nms_3d (fixpoint + blockwise) vs the numpy greedy oracle."""

import numpy as np
import pytest

from m3d.ops.nms3d import (nms_3d, nms_3d_blockwise, nms_3d_fixpoint,
                           nms_3d_numpy)
from tests.test_boxes import random_boxes

IMPLS = [nms_3d_fixpoint, nms_3d_blockwise]


@pytest.mark.parametrize("impl", IMPLS)
def test_nms_matches_numpy(rng, impl):
    for trial in range(5):
        n = [10, 50, 130, 257, 400][trial]
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thr in (0.3, 0.5, 0.7):
            want = nms_3d_numpy(boxes, scores, thr, max_output=64)
            idx, valid = impl(boxes, scores, thr, max_output=64)
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)


def test_nms_fixpoint_suppression_chains(rng):
    """Adversarial chains: box k suppresses k+1 but not k+2 — the fixpoint
    iteration must settle every chain level (A keeps, B dies, C keeps, ...)."""
    n = 40
    boxes = np.zeros((n, 6), np.float32)
    for k in range(n):
        # 50% linear overlap with the neighbor, none with the next-next.
        lo = k * 0.5
        boxes[k] = [lo, 0, 0, lo + 1.0, 1, 1]
    boxes /= boxes.max()
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    want = nms_3d_numpy(boxes, scores, 0.3, max_output=n)
    idx, valid = nms_3d_fixpoint(boxes, scores, 0.3, max_output=n)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)
    # chain semantics: exactly every other box survives
    np.testing.assert_array_equal(got, np.arange(0, n, 2))


def test_nms_identical_boxes(rng):
    # All boxes identical: only the highest-scored survives.
    boxes = np.tile(np.array([[0.1, 0.1, 0.1, 0.5, 0.5, 0.5]], np.float32), (20, 1))
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    idx, valid = nms_3d(boxes, scores, 0.5, max_output=8)
    assert int(np.asarray(valid).sum()) == 1
    assert int(np.asarray(idx)[0]) == int(scores.argmax())


def test_nms_disjoint_boxes():
    # Fully disjoint boxes: all kept, in score order.
    boxes = np.stack(
        [np.array([i * 0.1, i * 0.1, 0.0, i * 0.1 + 0.05, i * 0.1 + 0.05, 0.5])
         for i in range(8)]
    ).astype(np.float32)
    scores = np.arange(8, dtype=np.float32)
    idx, valid = nms_3d(boxes, scores, 0.5, max_output=8)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(7, -1, -1))


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.uniform(0, 1, 30).astype(np.float32)
    valid = np.zeros(30, bool)
    valid[:10] = True
    idx, out_valid = nms_3d(boxes, scores, 0.5, max_output=30, valid=valid)
    kept = np.asarray(idx)[np.asarray(out_valid)]
    assert (kept < 10).all()


def test_nms_max_output_truncates(rng):
    boxes = random_boxes(rng, 300)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    want = nms_3d_numpy(boxes, scores, 0.6, max_output=5)
    idx, valid = nms_3d(boxes, scores, 0.6, max_output=5)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want[:5])

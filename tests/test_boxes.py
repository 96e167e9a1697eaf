"""Box math vs fresh numpy oracles."""

import numpy as np
import pytest

from m3d import boxes as B


def random_boxes(rng, n, scale=1.0):
    lo = rng.uniform(0, 0.7 * scale, (n, 3))
    ext = rng.uniform(0.05 * scale, 0.3 * scale, (n, 3))
    return np.concatenate([lo, lo + ext], axis=1).astype(np.float32)


def iou_numpy(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float32)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            y1, x1, z1 = np.maximum(a[:3], b[:3])
            y2, x2, z2 = np.minimum(a[3:], b[3:])
            inter = max(y2 - y1, 0) * max(x2 - x1, 0) * max(z2 - z1, 0)
            va = np.prod(a[3:] - a[:3])
            vb = np.prod(b[3:] - b[:3])
            out[i, j] = inter / max(va + vb - inter, 1e-10)
    return out


def test_overlaps_3d(rng):
    b1 = random_boxes(rng, 13)
    b2 = random_boxes(rng, 7)
    got = np.asarray(B.overlaps_3d(b1, b2))
    want = iou_numpy(b1, b2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_overlaps_identity(rng):
    b = random_boxes(rng, 5)
    got = np.asarray(B.overlaps_3d(b, b))
    np.testing.assert_allclose(np.diag(got), np.ones(5), atol=1e-5)


def test_encode_apply_roundtrip(rng):
    src = random_boxes(rng, 20)
    dst = random_boxes(rng, 20)
    deltas = B.encode_deltas(src, dst)
    rec = np.asarray(B.apply_deltas(src, deltas))
    np.testing.assert_allclose(rec, dst, atol=1e-4)


def test_apply_deltas_log_clip(rng):
    src = random_boxes(rng, 4)
    deltas = np.zeros((4, 6), np.float32)
    deltas[:, 3:] = 100.0  # absurd log-scale, must be clamped
    out = np.asarray(B.apply_deltas(src, deltas))
    h = out[:, 3] - out[:, 0]
    h0 = src[:, 3] - src[:, 0]
    np.testing.assert_allclose(h / h0, 1000.0 / 16.0, rtol=1e-4)


def test_norm_denorm_roundtrip(rng):
    shape = (128, 128, 64)
    px = random_boxes(rng, 10, scale=60.0)
    norm = B.norm_boxes(px, shape)
    back = np.asarray(B.denorm_boxes(norm, shape))
    np.testing.assert_allclose(back, px, atol=1e-3)


def test_norm_boxes_no_shift():
    # divide-by-S convention, no -1 shift (reference: core/utils.py:201-213)
    px = np.array([[0, 0, 0, 128, 128, 64]], np.float32)
    norm = np.asarray(B.norm_boxes(px, (128, 128, 64)))
    np.testing.assert_allclose(norm, [[0, 0, 0, 1, 1, 1]], atol=1e-6)


def test_clip_to_window():
    b = np.array([[-0.5, 0.2, 0.1, 1.5, 0.8, 2.0]], np.float32)
    out = np.asarray(B.clip_to_window(b))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_enforce_min_size():
    b = np.array([[0.5, 0.5, 0.5, 0.5, 0.5, 0.5]], np.float32)
    out = np.asarray(B.enforce_min_size(b, min_yx=1e-6, min_z=0.1))
    assert out[0, 3] > out[0, 0]
    assert out[0, 5] - out[0, 2] == pytest.approx(0.1)

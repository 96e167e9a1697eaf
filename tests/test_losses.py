"""Loss semantics: zero at perfection, positive otherwise, masking rules."""

import numpy as np

from m3d.models import losses as L


def test_rpn_class_loss_perfect_predictions():
    match = np.array([[1, -1, 0, 1]], np.int32)
    logits = np.array(
        [[[-10, 10], [10, -10], [0, 0], [-10, 10]]], np.float32
    )
    loss, m = L.rpn_class_loss(match, logits)
    assert float(loss) < 1e-3
    assert int(m["rpn_n_pos"]) == 2 and int(m["rpn_n_neg"]) == 1


def test_rpn_class_loss_ignores_neutral():
    match = np.zeros((1, 8), np.int32)
    logits = np.random.randn(1, 8, 2).astype(np.float32)
    loss, _ = L.rpn_class_loss(match, logits)
    assert float(loss) == 0.0


def test_rpn_bbox_loss_pairing():
    """The r-th positive anchor (anchor order) pairs with target row r."""
    A, AT = 6, 4
    match = np.array([[0, 1, -1, 1, 0, 1]], np.int32)
    target = np.zeros((1, AT, 6), np.float32)
    target[0, 0] = 0.5  # for anchor 1
    target[0, 1] = 1.0  # for anchor 3
    target[0, 2] = -0.5  # for anchor 5
    pred = np.zeros((1, A, 6), np.float32)
    pred[0, 1] = 0.5
    pred[0, 3] = 1.0
    pred[0, 5] = -0.5
    loss, _ = L.rpn_bbox_loss(target, match, pred)
    assert float(loss) < 1e-6
    # Mess up one pairing -> loss rises
    pred[0, 3] = 0.0
    loss2, _ = L.rpn_bbox_loss(target, match, pred)
    assert float(loss2) > 0.01


def test_mrcnn_class_loss_perfect():
    target = np.array([[1, 0, 0]], np.int32)
    logits = np.array([[[-10, 10], [10, -10], [10, -10]]], np.float32)
    active = np.ones((1, 2), np.float32)
    loss, m = L.mrcnn_class_loss(target, logits, active)
    assert float(loss) < 1e-3
    assert float(m["class_pos_acc"]) == 1.0
    assert float(m["class_bg_acc"]) == 1.0


def test_mrcnn_class_loss_fp_penalty():
    target = np.zeros((1, 4), np.int32)
    confident_fp = np.array([[[-5, 5]] * 4], np.float32)  # bg predicted as fg
    active = np.ones((1, 2), np.float32)
    loss_fp, m = L.mrcnn_class_loss(target, confident_fp, active)
    assert int(m["class_confident_fp"]) == 4
    assert float(loss_fp) > 1.0


def test_mrcnn_bbox_loss_positives_only(rng):
    target = rng.randn(1, 5, 6).astype(np.float32) * 0.1
    cls = np.array([[1, 1, 0, 0, 0]], np.int32)
    pred = np.zeros((1, 5, 2, 6), np.float32)
    pred[0, :, 1, :] = target[0]  # class-1 predictions exact
    loss, _ = L.mrcnn_bbox_loss(target, cls, pred)
    assert float(loss) < 1e-6
    # background rows don't matter
    pred[0, 2:, 1, :] = 100.0
    loss2, _ = L.mrcnn_bbox_loss(target, cls, pred)
    assert float(loss2) < 1e-6


def test_mrcnn_mask_loss_dice(rng):
    m = 8
    cls = np.array([[1, 0]], np.int32)
    target = np.zeros((1, 2, m, m, m), np.float32)
    target[0, 0, 2:6, 2:6, 2:6] = 1.0
    pred = np.full((1, 2, m, m, m, 2), 0.5, np.float32)
    pred[0, 0, ..., 1] = target[0, 0]  # perfect prediction for class 1
    pred[0, 0, ..., 1] = np.clip(pred[0, 0, ..., 1], 1e-4, 1 - 1e-4)
    loss, metrics = L.mrcnn_mask_loss(target, cls, pred)
    assert float(metrics["mask_dice"]) > 0.99
    assert float(loss) < 0.02


def test_mrcnn_mask_loss_empty_targets_filtered():
    m = 4
    cls = np.array([[1]], np.int32)
    target = np.zeros((1, 1, m, m, m), np.float32)  # empty target
    pred = np.random.rand(1, 1, m, m, m, 2).astype(np.float32)
    loss, metrics = L.mrcnn_mask_loss(target, cls, pred)
    assert float(loss) == 0.0
    assert int(metrics["mask_valid_count"]) == 0

"""Proposal / detection-target / detection layers (fixed-shape semantics)."""

import jax
import numpy as np

from m3d.models.detection import refine_detections
from m3d.models.detection_targets import detection_targets
from m3d.models.proposal import generate_proposals


def test_generate_proposals_perfect_anchor(rng):
    """An anchor with huge fg score and zero deltas must survive as the top
    proposal, unchanged."""
    A = 300
    lo = rng.uniform(0, 0.7, (A, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.25, (A, 3)).astype(np.float32)
    anchors = np.concatenate([lo, lo + ext], 1)
    probs = np.zeros((1, A, 2), np.float32)
    probs[..., 0] = 0.9
    probs[..., 1] = 0.1
    probs[0, 42] = [0.01, 0.99]
    deltas = rng.randn(1, A, 6).astype(np.float32) * 0.1
    deltas[0, 42] = 0.0
    props, valid = generate_proposals(
        probs, deltas, anchors, np.ones(6, np.float32),
        proposal_count=16, nms_threshold=0.7, pre_nms_limit=128,
        image_depth=16,
    )
    assert props.shape == (1, 16, 6)
    assert bool(valid[0, 0])
    np.testing.assert_allclose(np.asarray(props[0, 0]), anchors[42], atol=1e-5)


def test_generate_proposals_bounds(rng):
    A = 200
    anchors = np.concatenate(
        [rng.uniform(0, 0.5, (A, 3)), rng.uniform(0.5, 1.0, (A, 3))], 1
    ).astype(np.float32)
    probs = rng.uniform(0, 1, (1, A, 2)).astype(np.float32)
    deltas = rng.randn(1, A, 6).astype(np.float32) * 5  # extreme deltas
    props, valid = generate_proposals(
        probs, deltas, anchors, np.asarray([0.1, 0.1, 0.1, 0.2, 0.2, 0.2],
                                           np.float32),
        proposal_count=32, nms_threshold=0.7, pre_nms_limit=64, image_depth=8,
    )
    p = np.asarray(props)
    assert p.min() >= 0.0 and p.max() <= 1.0
    v = np.asarray(valid)
    # valid proposals have positive extents, z >= 1/8
    assert (p[v][:, 5] - p[v][:, 2] >= 1.0 / 8 - 1e-5).all()


def make_gt(rng, g, H=32):
    lo = rng.uniform(0.1, 0.5, (g, 3)).astype(np.float32)
    ext = rng.uniform(0.2, 0.4, (g, 3)).astype(np.float32)
    boxes = np.concatenate([lo, np.minimum(lo + ext, 1.0)], 1)
    masks = np.zeros((H, H, H, g), np.float32)
    for i in range(g):
        y1, x1, z1, y2, x2, z2 = (boxes[i] * H).astype(int)
        masks[y1:y2, x1:x2, z1:z2, i] = 1.0
    return boxes, masks


def test_detection_targets_sampling(rng):
    g = 4
    gt_boxes, gt_masks = make_gt(rng, g)
    gt_class_ids = np.ones(g, np.int32)
    # proposals: exact GT copies (positives) + far-away boxes (negatives)
    neg = np.concatenate(
        [rng.uniform(0.8, 0.9, (20, 3)), rng.uniform(0.9, 1.0, (20, 3))], 1
    ).astype(np.float32)
    proposals = np.concatenate([gt_boxes, neg, np.zeros((8, 6), np.float32)])

    out = detection_targets(
        jax.random.PRNGKey(0), proposals, gt_class_ids, gt_boxes, gt_masks,
        np.asarray([0.1, 0.1, 0.1, 0.2, 0.2, 0.2], np.float32),
        train_rois_per_image=16, roi_positive_ratio=0.25,
        positive_iou_threshold=0.5, negative_iou_threshold=0.3,
    )
    n_pos = int(out["pos_count"])
    assert n_pos == 4  # all four GT copies sampled (cap = 4)
    cls = np.asarray(out["class_ids"])
    assert (cls[:n_pos] == 1).all()
    assert (cls[n_pos:] == 0).all()
    # positive deltas ~ 0 (proposal == gt box)
    np.testing.assert_allclose(np.asarray(out["deltas"][:n_pos]), 0.0, atol=1e-3)
    # positive masks mostly filled (GT mask fills its own box)
    m = np.asarray(out["masks"][:n_pos])
    assert m.mean() > 0.5
    # negative/padding masks empty
    assert float(np.asarray(out["masks"][n_pos:]).sum()) == 0.0


def test_detection_targets_no_gt(rng):
    proposals = np.concatenate(
        [rng.uniform(0, 0.5, (10, 3)), rng.uniform(0.5, 1, (10, 3))], 1
    ).astype(np.float32)
    out = detection_targets(
        jax.random.PRNGKey(1), proposals,
        np.zeros(5, np.int32), np.zeros((5, 6), np.float32),
        np.zeros((16, 16, 16, 5), np.float32),
        np.ones(6, np.float32),
        train_rois_per_image=8, roi_positive_ratio=0.25,
        positive_iou_threshold=0.5, negative_iou_threshold=0.3,
    )
    assert int(out["pos_count"]) == 0
    assert (np.asarray(out["class_ids"]) == 0).all()


def test_refine_detections(rng):
    R = 32
    lo = rng.uniform(0.1, 0.5, (R, 3)).astype(np.float32)
    ext = rng.uniform(0.1, 0.3, (R, 3)).astype(np.float32)
    rois = np.concatenate([lo, lo + ext], 1)
    probs = np.zeros((R, 2), np.float32)
    probs[:, 1] = rng.uniform(0, 1, R)
    probs[:, 0] = 1 - probs[:, 1]
    deltas = np.zeros((R, 2, 6), np.float32)

    det, valid = refine_detections(
        rois, probs, deltas, (64.0, 64.0, 16.0),
        np.asarray([0.1, 0.1, 0.1, 0.2, 0.2, 0.2], np.float32),
        min_confidence=0.5, nms_threshold=0.3, max_instances=10,
    )
    det, valid = np.asarray(det), np.asarray(valid)
    assert det.shape == (10, 8)
    # all surviving detections have score >= confidence, sorted descending
    scores = det[valid, 7]
    assert (scores >= 0.5).all()
    assert (np.diff(scores) <= 1e-6).all()
    # class column is 1.0 (binary product semantics)
    assert (det[valid, 6] == 1.0).all()


def test_refine_detections_zero_deltas_keeps_rois(rng):
    rois = np.array([[0.2, 0.2, 0.2, 0.6, 0.6, 0.6]], np.float32)
    probs = np.array([[0.1, 0.9]], np.float32)
    deltas = np.zeros((1, 2, 6), np.float32)
    det, valid = refine_detections(
        rois, probs, deltas, (64.0, 64.0, 64.0),
        np.ones(6, np.float32), 0.2, 0.5, 4,
    )
    assert bool(np.asarray(valid)[0])
    np.testing.assert_allclose(np.asarray(det)[0, :6], rois[0], atol=1e-4)

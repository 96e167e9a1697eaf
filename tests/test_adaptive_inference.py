"""Adaptive (valid-count-chunked) inference == monolithic inference.

The chunked per-ROI stages (m3d/models/inference.py) must reproduce
``MaskRCNN.__call__`` exactly on every valid slot, zero-fill fully skipped
chunks, and handle chunk sizes that do not divide the padded ROI axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.models.inference import adaptive_inference, chunked_roi_stage
from m3d.models.mask_rcnn import MaskRCNN


def tiny_config(**kw):
    base = dict(
        IMAGE_SIZE=64,
        IMAGE_DEPTH=8,
        NUM_CLASSES=2,
        BACKBONE="resnet50",
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                          (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 16, 24, 32, 48),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        PRE_NMS_LIMIT=512,
        POST_NMS_ROIS_INFERENCE=64,
        DETECTION_MAX_INSTANCES=8,
        # Random-init classifier emits fg probs around the 0.15 prior —
        # a low floor makes real (valid) detections appear.
        DETECTION_MIN_CONFIDENCE=0.01,
        POOL_SIZE=7,
        MASK_POOL_SIZE=14,
        FPN_CLASSIF_FC_LAYERS_SIZE=64,
        HEAD_CONV_CHANNEL=32,
        TOP_DOWN_PYRAMID_SIZE=32,
        COMPUTE_DTYPE="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def built():
    cfg = tiny_config()
    model = MaskRCNN.from_config(cfg, mode="inference")
    image = np.random.RandomState(3).randn(2, 64, 64, 8, 1).astype(np.float32)
    anchors = normalized_pyramid_anchors(cfg)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    variables = model.init(jax.random.PRNGKey(0), image[:1], meta[:1], anchors)
    full = jax.device_get(model.apply(variables, image, meta, anchors))
    return cfg, model, variables, image, anchors, meta, full


def _check_equiv(full, out, mask_chunk):
    det_valid = np.asarray(full["detections_valid"])
    np.testing.assert_array_equal(np.asarray(out["detections_valid"]),
                                  det_valid)
    np.testing.assert_allclose(np.asarray(out["detections"]),
                               np.asarray(full["detections"]),
                               rtol=1e-4, atol=1e-5)
    counts = det_valid.sum(axis=1)
    assert counts.max() > 0, "fixture produced no valid detections"
    masks_f = np.asarray(full["mrcnn_masks"], np.float32)
    masks_a = np.asarray(out["mrcnn_masks"], np.float32)
    for b in range(det_valid.shape[0]):
        c = int(counts[b])
        np.testing.assert_allclose(masks_a[b, :c], masks_f[b, :c],
                                   rtol=1e-4, atol=1e-5)
    # Compacted semantics: slots whose valid-first flat rank falls beyond
    # the last active chunk are exactly zero (skipped chunks).
    bsz, n = det_valid.shape
    flat_valid = det_valid.reshape(bsz * n)
    perm = np.argsort(~flat_valid, kind="stable")
    total = int(flat_valid.sum())
    boundary = -(-total // mask_chunk) * mask_chunk
    masks_flat = masks_a.reshape((bsz * n,) + masks_a.shape[2:])
    if boundary < bsz * n:
        assert (masks_flat[perm[boundary:]] == 0).all()


@pytest.mark.parametrize("cls_chunk,mask_chunk", [(16, 4), (24, 3)])
def test_adaptive_matches_monolithic(built, cls_chunk, mask_chunk):
    cfg, model, variables, image, anchors, meta, full = built
    out = jax.device_get(jax.jit(
        lambda v, img: adaptive_inference(
            model, v, img, meta, anchors,
            classifier_chunk=cls_chunk, mask_chunk=mask_chunk)
    )(variables, image))
    _check_equiv(full, out, mask_chunk)
    # Classifier probs agree on valid proposal slots.
    pv = np.asarray(full["proposals_valid"])
    pa = np.asarray(out["mrcnn_probs"])
    pf = np.asarray(full["mrcnn_probs"])
    for b in range(pv.shape[0]):
        c = int(pv[b].sum())
        np.testing.assert_allclose(pa[b, :c], pf[b, :c], rtol=1e-4, atol=1e-5)
    # Classifier compacted semantics: flat valid-first ranks beyond the
    # last active chunk are exactly zero (skipped chunks).
    flat_pv = pv.reshape(-1)
    cperm = np.argsort(~flat_pv, kind="stable")
    cboundary = -(-int(flat_pv.sum()) // cls_chunk) * cls_chunk
    probs_flat = pa.reshape((-1,) + pa.shape[2:])
    if cboundary < flat_pv.size:
        assert (probs_flat[cperm[cboundary:]] == 0).all()


def test_adaptive_zero_detections(built):
    cfg, model, variables, image, anchors, meta, full = built
    model99 = model.clone(detection_min_confidence=0.99)
    out = jax.device_get(adaptive_inference(
        model99, variables, image, meta, anchors, mask_chunk=4))
    assert not np.asarray(out["detections_valid"]).any()
    assert (np.asarray(out["mrcnn_masks"]) == 0).all()


def test_chunked_roi_stage_unit():
    b, n = 2, 10
    rois = jnp.arange(b * n * 6, dtype=jnp.float32).reshape(b, n, 6)

    def fn(r):
        return {"s": r.sum(-1) * 2.0, "r": r + 1.0}

    # max_valid=7, chunk=3 -> chunks [0:3),[3:6),[6:9) active, [9:10) skipped.
    out = jax.jit(lambda r: chunked_roi_stage(fn, r, 7, 3))(rois)
    ref = fn(rois)
    np.testing.assert_allclose(np.asarray(out["s"][:, :9]),
                               np.asarray(ref["s"][:, :9]))
    np.testing.assert_allclose(np.asarray(out["r"][:, :9]),
                               np.asarray(ref["r"][:, :9]))
    assert (np.asarray(out["s"][:, 9:]) == 0).all()
    assert (np.asarray(out["r"][:, 9:]) == 0).all()
    # chunk >= N falls back to one monolithic call.
    out2 = chunked_roi_stage(fn, rois, 7, 16)
    np.testing.assert_allclose(np.asarray(out2["s"]), np.asarray(ref["s"]))


def test_head_max_rois_cap(built):
    """HEAD_MAX_ROIS caps score-sorted proposals entering the classifier
    (reference limit_rois, core/models.py:1254-1270): the per-ROI stages see
    exactly the first N proposals of the uncapped run."""
    cfg, model, variables, image, anchors, meta, full = built
    capped = model.clone(head_max_rois=16)
    out = jax.device_get(capped.apply(variables, image, meta, anchors))
    assert out["mrcnn_probs"].shape[1] == 16
    np.testing.assert_allclose(np.asarray(out["proposals"]),
                               np.asarray(full["proposals"])[:, :16])
    # adaptive path applies the same cap
    out_a = jax.device_get(adaptive_inference(
        capped, variables, image, meta, anchors, mask_chunk=4))
    np.testing.assert_allclose(np.asarray(out_a["proposals"]),
                               np.asarray(full["proposals"])[:, :16])

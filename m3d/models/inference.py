"""Valid-count-adaptive Mask R-CNN inference.

The reference inference graph (core/models.py:5695-5740) — like
``MaskRCNN.__call__`` — runs the per-ROI head stages on every padded slot:
the classifier on all POST_NMS_ROIS_INFERENCE proposals and the mask head on
all DETECTION_MAX_INSTANCES detection slots, regardless of how many are real.
On scenes sparser than the configured maxima that is pure waste: the mask
head is ~55% of the 128³ inference budget and its convolutions already run
at 96-97% of bf16 peak, so the only remaining lever is computing fewer of
them.

This module exploits an invariant both producers guarantee (proposal NMS and
detection NMS emit score-sorted outputs with the valid slots compacted to the
front — m3d/ops/nms3d.py): the padded ROI axis is processed in fixed-size
chunks inside ``lax.scan``, and a ``lax.cond`` skips every chunk that lies
entirely in the padding region. XLA:TPU executes conditionals dynamically, so
skipped chunks cost ~nothing while shapes stay fully static — one compiled
graph serves any instance count, unlike a host-side two-tier dispatch which
would pay a device->host sync per image.

Semantics are preserved exactly: skipped classifier chunks yield zero class
probabilities for slots whose proposals are zero-padding anyway (the
detection layer independently filters padding via its ``roi_valid`` mask),
and skipped mask chunks yield zero masks for slots ``detections_valid``
already marks dead. Outputs for valid slots are bit-identical to the
monolithic graph (tests/test_adaptive_inference.py asserts this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from m3d.models.detection import refine_detections_batch
from m3d.models.mask_rcnn import MaskRCNN


def default_chunks(model: "MaskRCNN"):
    """Measured-good chunk sizes (scripts/bench_adaptive.py, v5e, 128³ B=4):
    chunking is free even when every chunk is active (50/50 valid: 136.9 ms
    vs 137.5 monolithic; chunked classifier at full 500 count measures ~4 ms
    FASTER than monolithic — smaller per-dispatch footprints schedule
    better), and each skipped mask chunk of 10 saves ~14.3 ms. So adaptive
    chunking is the default inference path.

    Returns (classifier_chunk, mask_chunk); None disables a stage's chunking
    (axis too short to split).
    """
    cls = None
    if model.post_nms_rois > 128:
        cls = min(256, max(64, -(-model.post_nms_rois // 4)))
    mask = None
    if model.detection_max_instances > 10:
        mask = max(8, -(-model.detection_max_instances // 5))
    return cls, mask


def chunks_from_config(config, model: "MaskRCNN"):
    """Config-overridable chunk sizes: CLASSIFIER_CHUNK / MASK_CHUNK keys
    (0 = force monolithic, absent/None = measured auto defaults)."""
    auto_cls, auto_mask = default_chunks(model)

    def pick(key, auto):
        v = getattr(config, key, None)
        if v is None:
            return auto
        return int(v) or None

    return pick("CLASSIFIER_CHUNK", auto_cls), pick("MASK_CHUNK", auto_mask)


def chunked_roi_stage(apply_chunk, rois, max_valid, chunk: int):
    """Apply a per-ROI stage over chunks of the (padded) ROI axis, skipping
    chunks that start at or beyond ``max_valid``.

    Args:
      apply_chunk: pure fn, rois [B, chunk, 6] -> pytree of [B, chunk, ...].
      rois: [B, N, 6]; valid slots compacted to the front of axis 1.
      max_valid: [] int32 — max valid count across the batch (traced value).
      chunk: static chunk size along the ROI axis.

    Returns the same pytree apply_chunk would return for the full [B, N, 6]
    input, with skipped-chunk slots zero-filled.
    """
    b, n = rois.shape[:2]
    chunk = int(chunk)
    if chunk >= n:
        return apply_chunk(rois)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        rois = jnp.pad(rois, ((0, 0), (0, pad), (0, 0)))

    out_sds = jax.eval_shape(
        apply_chunk,
        jax.ShapeDtypeStruct((b, chunk) + rois.shape[2:], rois.dtype),
    )
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_sds)
    max_valid = jnp.asarray(max_valid, jnp.int32)

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim(rois, i * chunk, chunk, axis=1)
        out = jax.lax.cond(
            i * chunk < max_valid, apply_chunk, lambda _: zeros, sl
        )
        return carry, out

    _, outs = jax.lax.scan(body, 0, jnp.arange(n_chunks, dtype=jnp.int32))

    def stitch(x):  # [n_chunks, B, chunk, ...] -> [B, N, ...]
        x = jnp.moveaxis(x, 0, 1)
        x = x.reshape((b, n_chunks * chunk) + x.shape[3:])
        return x[:, :n]

    return jax.tree.map(stitch, outs)


def _valid_count(valid):
    """Max per-image valid count across the batch ([] int32)."""
    return jnp.max(jnp.sum(valid.astype(jnp.int32), axis=1))


def adaptive_inference(model: MaskRCNN, variables, image, image_meta, anchors,
                       *, classifier_chunk: int | None = None,
                       mask_chunk: int | None = None):
    """Full inference (same contract as ``MaskRCNN.__call__``) with the
    per-ROI stages chunk-gated on actual valid counts.

    A chunk argument of None/0 runs that stage monolithically (identical to
    ``__call__``). The stage composition happens through ``model.apply`` on
    individual methods — pure functions, safe inside ``lax.cond``/``scan``
    (flax lifted transforms are not needed because no variables are created).
    """
    feats = model.apply(variables, image, method=MaskRCNN.extract_features)
    logits, probs, deltas = model.apply(
        variables, list(feats), method=MaskRCNN.rpn_forward
    )
    proposals, prop_valid = model.apply(
        variables, probs, deltas, anchors, method=MaskRCNN.propose
    )
    mrcnn_feats = list(feats[:4])  # P2..P5

    def classify(rois):
        return model.apply(variables, rois, image_meta, mrcnn_feats,
                           method=MaskRCNN.classify_rois)

    if classifier_chunk:
        cls_logits, cls_probs, cls_bbox = chunked_roi_stage(
            classify, proposals, _valid_count(prop_valid),
            int(classifier_chunk),
        )
    else:
        cls_logits, cls_probs, cls_bbox = classify(proposals)

    detections, det_valid = refine_detections_batch(
        proposals, cls_probs, cls_bbox, image_meta,
        jnp.asarray(model.bbox_std_dev, jnp.float32),
        model.detection_min_confidence,
        model.detection_nms_threshold,
        model.detection_max_instances,
        nms_xy_only=model.detection_nms_xy_only,
    )

    def mask(rois):
        return model.apply(variables, rois, image_meta, mrcnn_feats,
                           method=MaskRCNN.mask_rois)

    if mask_chunk:
        masks = chunked_roi_stage(
            mask, detections[..., :6], _valid_count(det_valid),
            int(mask_chunk),
        )
    else:
        masks = mask(detections[..., :6])

    return {
        "detections": detections,
        "detections_valid": det_valid,
        "mrcnn_masks": masks,
        "mrcnn_probs": cls_probs,
        "mrcnn_bbox": cls_bbox,
        "proposals": proposals,
        "proposals_valid": prop_valid,
    }

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

Both per-ROI stages are compacted CROSS-BATCH: the ROI boxes (a tiny [B*N]
tensor) are sorted valid-first across the flattened batch × slot axis and
per-ROI compute is gated on the TOTAL live count in the batch, so one
crowded image does not force full-width compute for its whole batch. For
the classifier stage (``compacted_classifier_stage``) each flat chunk runs
gather-path ROIAlign + FC head under one ``lax.cond`` — skipping a chunk
skips its gather too, and the pooled [chunk, 7³, C] tensor stays small
enough to fuse instead of materializing to HBM. For the mask stage
(``compacted_mask_stage``) ROIAlign writes the pooled features already
compacted (the Pallas VMEM kernel skips dead rows —
m3d/ops/roialign3d.py:pyramid_roi_align_compact) and the mask-head
convolutions — the expensive part — run chunk-gated on the same total.

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
    chunking is ~free even when every chunk is active (chunked classifier at
    full 500 count measures ~4 ms FASTER than monolithic — smaller
    per-dispatch footprints schedule better), and each skipped mask-conv ROI
    saves ~0.28 ms. So adaptive chunking is the default inference path.

    Returns (classifier_chunk, mask_chunk); None disables a stage's chunking
    (axis too short to split). Both chunks apply to the FLATTENED batch ×
    slot axis (compacted_*_stage), so per-ROI cost tracks the TOTAL live
    count in the batch. 40 ROIs per mask chunk keeps the chunk's
    convolutions MXU-shaped (C=10 measured 0.45 ms/ROI vs 0.28 at C=40);
    125 proposals per classifier chunk matches the measured-best per-image
    chunking granularity (C=125 at full count ran ~4 ms FASTER than
    monolithic). chunked_roi_stage degrades to one monolithic call when the
    flat axis is not longer than the chunk.
    """
    cls = None
    if model.post_nms_rois > 128:
        cls = min(256, max(64, -(-model.post_nms_rois // 4)))
    mask = None
    if model.detection_max_instances > 10:
        mask = 40
    return cls, mask


def chunks_from_config(config, model: "MaskRCNN", auto: bool = True):
    """Config-overridable chunk sizes: CLASSIFIER_CHUNK / MASK_CHUNK keys
    (0 = force monolithic, absent/None = measured auto defaults).

    ``auto=False`` drops the measured auto defaults to monolithic (None) —
    explicit config keys still win. Used by data-parallel serving exports
    (m3d/serve.py), where cross-batch compaction would couple shards."""
    auto_cls, auto_mask = default_chunks(model) if auto else (None, None)

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
      apply_chunk: pure fn, [B, chunk, ...] -> pytree of [B, chunk, ...].
      rois: [B, N, ...] per-ROI items (boxes, or pre-aligned features);
        valid slots compacted to the front of axis 1.
      max_valid: [] int32 — gating count (traced value); chunks starting at
        or beyond it are skipped.
      chunk: static chunk size along the ROI axis.

    Returns the same pytree apply_chunk would return for the full [B, N, ...]
    input, with skipped-chunk slots zero-filled.
    """
    b, n = rois.shape[:2]
    chunk = int(chunk)
    if chunk >= n:
        return apply_chunk(rois)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        rois = jnp.pad(
            rois, ((0, 0), (0, pad)) + ((0, 0),) * (rois.ndim - 2))

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


def _compact_perm(valid):
    """Valid-first stable permutation of the flattened [B, N] validity mask.
    Returns (perm, inv, total): flat indices live-rows-first (image-major
    and score-ordered within the live block — both NMS producers emit
    front-compacted, score-sorted slots), its inverse, and the live count.
    """
    b, n = valid.shape[:2]
    valid_f = valid.reshape(b * n)
    perm = jnp.argsort(jnp.logical_not(valid_f), stable=True)
    inv = jnp.argsort(perm)
    total = jnp.sum(valid_f.astype(jnp.int32))
    return perm, inv, total


def compacted_classifier_stage(model, variables, proposals, prop_valid,
                               image_meta, mrcnn_feats, chunk: int):
    """Classifier stage with cross-batch BOX-level compaction.

    Same construction as ``compacted_mask_stage``, applied to the proposal
    axis: proposals are sorted valid-first over the flattened batch × slot
    axis, and chunks of the flat list run ROIAlign (the gather path — its
    cost is ∝ rows gathered, so skipped chunks skip the gather too, not just
    the FC convs) + the classifier head under ``lax.cond`` gated on the
    TOTAL live proposal count. Per-image chunking can only skip work shared
    by every image in the batch; at real workloads proposal counts are
    skewed, and NMS rarely fills POST_NMS_ROIS_INFERENCE, so the batch total
    is the right gate.

    Returns (class_logits, class_probs, bbox_deltas) shaped [B, N, ...];
    slots whose compacted rank falls beyond the last active chunk are zero
    (their zero-padding proposals are filtered downstream by the detection
    layer's own roi_valid mask — m3d/models/detection.py:54).
    """
    b, n = prop_valid.shape[:2]
    perm, inv, total = _compact_perm(prop_valid)
    boxes_f = proposals.reshape(b * n, 6)[perm]
    batch_f = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)[perm]
    # Pack boxes + source-image index into one array so chunked_roi_stage
    # slices them together (small int indices are exact in f32).
    packed = jnp.concatenate(
        [boxes_f, batch_f.astype(jnp.float32)[:, None]], axis=-1)[None]

    def cls_chunk(x):  # [1, chunk, 7]
        logits, probs, deltas = model.apply(
            variables, x[0, :, :6], x[0, :, 6].astype(jnp.int32),
            image_meta, mrcnn_feats, method=MaskRCNN.classify_rois_flat)
        return logits[None], probs[None], deltas[None]

    outs = chunked_roi_stage(cls_chunk, packed, total, int(chunk))

    def unflat(x):
        x = x[0][inv]
        return x.reshape((b, n) + x.shape[1:])

    return jax.tree.map(unflat, outs)


def compacted_mask_stage(model, variables, detections, det_valid, image_meta,
                         mrcnn_feats, chunk: int):
    """Mask head with cross-batch BOX-level compaction: compute only rows
    that exist.

    Gating chunks on the per-image max wastes whenever instance counts are
    skewed across the batch (one crowded image forces every chunk on for the
    whole batch). Here the detection BOXES — a tiny [B*N, 6] tensor — are
    sorted valid-first across the flattened batch × slot axis (stable, so
    the live block stays image-major and score-ordered), ROIAlign writes the
    pooled features already compacted (``pyramid_roi_align_compact``: the
    Pallas VMEM kernel skips rows at or beyond the total live count), and
    the mask-head convolutions run chunk-gated on that same total. Only the
    final [B*N, (2m)³, num_classes] masks are inverse-permuted back to
    padded slot order.

    An earlier variant aligned all padded slots and permuted the ~280 MB
    pooled-feature tensor instead; its measured floor was ~17.5 ms above the
    per-image-gated path (scripts/bench_adaptive.py, v5e 128³ B=4:
    ``compact mask C=40 total=0`` 83.0 ms vs ``mask C=10 count=0`` 65.5 ms),
    which box-level compaction removes.

    Returns masks [B, N, 2m, 2m, 2m, num_classes]; invalid slots whose
    compacted rank falls beyond the last active chunk are zero.
    """
    b, n = det_valid.shape[:2]
    # Stable sort: valid slots first; within the live block the original
    # (image, score) order is preserved, so rows stay image-grouped — the
    # layout the compact VMEM kernel's pyramid-residency model requires.
    perm, inv, total = _compact_perm(det_valid)

    boxes_f = detections[..., :6].reshape(b * n, 6)[perm]
    batch_f = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)[perm]
    aligned = model.apply(variables, boxes_f, batch_f, total, image_meta,
                          mrcnn_feats, method=MaskRCNN.mask_align_compact)

    def head_chunk(x):
        return model.apply(variables, x, method=MaskRCNN.apply_mask_head)

    masks_flat = chunked_roi_stage(head_chunk, aligned[None], total,
                                   int(chunk))[0]
    masks = masks_flat[inv]
    return masks.reshape((b, n) + masks.shape[1:])


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
    # HEAD_MAX_ROIS cap on score-sorted proposals (reference limit_rois,
    # core/models.py:1254-1270) — same slice as MaskRCNN.__call__.
    cap = int(model.head_max_rois or 0)
    if cap and cap < proposals.shape[1]:
        proposals = proposals[:, :cap]
        prop_valid = prop_valid[:, :cap]
    mrcnn_feats = list(feats[:4])  # P2..P5

    if classifier_chunk:
        cls_logits, cls_probs, cls_bbox = compacted_classifier_stage(
            model, variables, proposals, prop_valid, image_meta, mrcnn_feats,
            chunk=int(classifier_chunk),
        )
    else:
        cls_logits, cls_probs, cls_bbox = model.apply(
            variables, proposals, image_meta, mrcnn_feats,
            method=MaskRCNN.classify_rois)

    detections, det_valid = refine_detections_batch(
        proposals, cls_probs, cls_bbox, image_meta,
        jnp.asarray(model.bbox_std_dev, jnp.float32),
        model.detection_min_confidence,
        model.detection_nms_threshold,
        model.detection_max_instances,
        nms_xy_only=model.detection_nms_xy_only,
    )

    if mask_chunk:
        masks = compacted_mask_stage(
            model, variables, detections, det_valid, image_meta, mrcnn_feats,
            chunk=int(mask_chunk),
        )
    else:
        masks = model.apply(variables, detections[..., :6], image_meta,
                            mrcnn_feats, method=MaskRCNN.mask_rois)

    return {
        "detections": detections,
        "detections_valid": det_valid,
        "mrcnn_masks": masks,
        "mrcnn_probs": cls_probs,
        "mrcnn_bbox": cls_bbox,
        "proposals": proposals,
        "proposals_valid": prop_valid,
    }

"""Final detection refinement: ROIs + class probs + deltas -> detections.

Parity with the reference refine_detections_graph / DetectionLayer
(core/models.py:1415-1575): foreground probability from class column 1,
confidence filter at DETECTION_MIN_CONFIDENCE, class-1 delta application in
pixel space (with BBOX_STD_DEV and the log-scale clamp), pixel min-size
filter (1px y/x, 0.5px z), NMS, top-K, renormalize, pad to
DETECTION_MAX_INSTANCES. Output rows are
``(y1,x1,z1,y2,x2,z2, class_id, score)`` in normalized coordinates.

Notes on reference quirks handled deliberately:
- The reference's detection NMS runs 2-D on the (x, y) footprint only,
  ignoring z (core/models.py:1496-1501). We default to true 3-D NMS and
  provide ``nms_xy_only=True`` for exact-parity evaluation.
- The reference emits class_id = 1.0 for every detection (binary product,
  core/models.py:1504); we keep the argmax-free binary semantics.

TPU design: filters become validity masks; per-image work is vmapped; all
shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from m3d import boxes as B
from m3d.ops.nms3d import nms_3d


@functools.partial(
    jax.jit, static_argnames=("max_instances", "nms_xy_only")
)
def refine_detections(rois, probs, deltas, image_shape, bbox_std_dev,
                      min_confidence, nms_threshold, max_instances: int,
                      nms_xy_only: bool = False):
    """Single-image detection refinement. Batch via vmap or refine_detections_batch.

    Args:
      rois: [R, 6] normalized proposals (zero-padded).
      probs: [R, C] class softmax.
      deltas: [R, C, 6] per-class standardized deltas.
      image_shape: (H, W, D) floats (from image meta).
      bbox_std_dev: [6].

    Returns:
      detections: [max_instances, 8].
      valid: [max_instances] bool.
    """
    rois = jnp.asarray(rois, jnp.float32)
    fg_probs = jnp.asarray(probs, jnp.float32)[:, 1]
    roi_valid = jnp.sum(jnp.abs(rois), axis=1) > 0

    keep = jnp.logical_and(fg_probs >= min_confidence, roi_valid)

    # Class-1 deltas; de-standardize inside apply (reference multiplies by
    # std then applies with the log-scale clamp, core/utils.py:412-464).
    d = jnp.asarray(deltas, jnp.float32)[:, 1, :] * jnp.asarray(
        bbox_std_dev, jnp.float32
    )
    h, w, dd = (jnp.asarray(s, jnp.float32) for s in image_shape[:3])
    rois_px = B.denorm_boxes(rois, (h, w, dd))
    boxes_px = B.apply_deltas(rois_px, d, clip_log_scale=True)

    # Clip to image bounds in pixels.
    boxes_px = jnp.stack(
        [
            jnp.clip(boxes_px[:, 0], 0.0, h),
            jnp.clip(boxes_px[:, 1], 0.0, w),
            jnp.clip(boxes_px[:, 2], 0.0, dd),
            jnp.clip(boxes_px[:, 3], 0.0, h),
            jnp.clip(boxes_px[:, 4], 0.0, w),
            jnp.clip(boxes_px[:, 5], 0.0, dd),
        ],
        axis=1,
    )

    # Pixel min sizes (reference: core/models.py:1481-1490).
    hh = boxes_px[:, 3] - boxes_px[:, 0]
    ww = boxes_px[:, 4] - boxes_px[:, 1]
    zz = boxes_px[:, 5] - boxes_px[:, 2]
    keep = jnp.logical_and(
        keep, (hh >= 1.0) & (ww >= 1.0) & (zz >= 0.5)
    )

    nms_boxes = boxes_px
    if nms_xy_only:
        # Replicate the reference's 2-D footprint NMS: flatten z to a unit slab.
        zeros = jnp.zeros_like(boxes_px[:, 2])
        ones = jnp.ones_like(boxes_px[:, 2])
        nms_boxes = jnp.stack(
            [boxes_px[:, 0], boxes_px[:, 1], zeros,
             boxes_px[:, 3], boxes_px[:, 4], ones], axis=1
        )

    idx, out_valid = nms_3d(nms_boxes, fg_probs, nms_threshold,
                            max_output=max_instances, valid=keep)

    final_px = jnp.where(out_valid[:, None], boxes_px[idx], 0.0)
    final_scores = jnp.where(out_valid, fg_probs[idx], 0.0)
    final_norm = B.norm_boxes(final_px, (h, w, dd), clip=False)
    class_col = jnp.where(out_valid, 1.0, 0.0)

    detections = jnp.concatenate(
        [final_norm, class_col[:, None], final_scores[:, None]], axis=1
    )
    return detections, out_valid


def refine_detections_batch(rois, probs, deltas, image_meta, bbox_std_dev,
                            min_confidence, nms_threshold, max_instances,
                            nms_xy_only=False):
    """[B, ...] batch wrapper; image shapes read from image_meta[:, 5:8]."""
    from m3d.image_meta import parse_image_meta

    shapes = parse_image_meta(image_meta)["image_shape"][:, :3]  # [B, 3]
    fn = functools.partial(
        refine_detections,
        bbox_std_dev=bbox_std_dev,
        min_confidence=min_confidence,
        nms_threshold=nms_threshold,
        max_instances=max_instances,
        nms_xy_only=nms_xy_only,
    )
    return jax.vmap(fn)(rois, probs, deltas, shapes)

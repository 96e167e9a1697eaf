"""Detection-target sampling: proposals + GT -> fixed-T training targets.

Parity with the reference DetectionTargetLayer / detection_targets_graph
(core/models.py:736-1114): positives are proposals with max-GT-IoU >=
RPN_POSITIVE_IOU, negatives < RPN_NEGATIVE_IOU; positives are randomly
subsampled to TRAIN_ROIS_PER_IMAGE * ROI_POSITIVE_RATIO, negatives fill the
remainder; each positive gets its argmax GT's class, standardized box deltas,
and its GT mask cropped to MASK_SHAPE (28^3) by crop-and-resize + round.
Outputs are padded to TRAIN_ROIS_PER_IMAGE with positives first.

TPU design: pure fixed-shape function of (proposals, gt, PRNG key), vmapped
over the batch — replaces the reference's tf.cond/tf.where/random.shuffle
dynamic graph. Randomness is explicit via jax.random (reproducible, unlike
the reference's unseeded shuffle). Degenerate inputs (no GT / no proposals)
degrade naturally through validity masks instead of tf.cond branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from m3d import boxes as B
from m3d.ops.roialign3d import crop_and_resize_3d

NEG_INF = -1e30


def _sample_k(key, eligible, cap: int):
    """Randomly order `eligible` True positions; return (idx [cap], count).

    idx[:count] are `count = min(sum(eligible), cap)` randomly-chosen eligible
    positions; the tail is arbitrary (callers mask by slot < count).
    """
    r = jax.random.uniform(key, eligible.shape)
    keys = jnp.where(eligible, r, NEG_INF)
    _, idx = jax.lax.top_k(keys, cap)
    count = jnp.minimum(jnp.sum(eligible.astype(jnp.int32)), cap)
    return idx, count


@functools.partial(
    jax.jit,
    static_argnames=("train_rois_per_image", "roi_positive_ratio",
                     "mask_shape", "use_mini_mask"),
)
def detection_targets(key, proposals, gt_class_ids, gt_boxes, gt_masks,
                      bbox_std_dev,
                      train_rois_per_image: int,
                      roi_positive_ratio: float,
                      positive_iou_threshold,
                      negative_iou_threshold,
                      mask_shape: tuple = (28, 28, 28),
                      use_mini_mask: bool = False):
    """Single-image target sampling. Batch via vmap(detection_targets).

    Args:
      key: jax.random key.
      proposals: [P, 6] normalized, zero-padded.
      gt_class_ids: [G] int (0 = padding).
      gt_boxes: [G, 6] normalized, zero-padded.
      gt_masks: [H, W, D, G] float/bool full-resolution instance masks —
        or, with use_mini_mask, [mH, mW, mD, G] mini-masks where each
        instance's mask spans exactly its GT box (m3d.utils.minimask).
      use_mini_mask: crop mask targets in GT-box-relative coordinates
        (reference core/models.py:975-993): each positive ROI box is
        re-expressed relative to its assigned GT box before the
        crop-and-resize, because the mini-mask's unit cube IS the GT box.

    Returns dict with fixed shapes (T = train_rois_per_image):
      rois [T,6], gt_boxes [T,6], class_ids [T], deltas [T,6],
      masks [T, *mask_shape], pos_count [], valid [T] bool.
    """
    T = train_rois_per_image
    P = proposals.shape[0]
    pos_cap = min(int(round(T * roi_positive_ratio)), P)
    neg_cap = min(T, P)
    k_pos, k_neg = jax.random.split(key)

    prop_valid = jnp.sum(jnp.abs(proposals), axis=1) > 0  # [P]
    gt_valid = jnp.sum(jnp.abs(gt_boxes), axis=1) > 0     # [G]

    overlaps = B.overlaps_3d(proposals, gt_boxes)          # [P, G]
    overlaps = jnp.where(gt_valid[None, :], overlaps, 0.0)
    overlaps = jnp.where(prop_valid[:, None], overlaps, 0.0)
    roi_iou_max = jnp.max(overlaps, axis=1)                # [P]

    positive = jnp.logical_and(roi_iou_max >= positive_iou_threshold, prop_valid)
    negative = jnp.logical_and(roi_iou_max < negative_iou_threshold, prop_valid)

    pos_idx, n_pos = _sample_k(k_pos, positive, pos_cap)      # [pos_cap]
    neg_idx, n_neg_avail = _sample_k(k_neg, negative, neg_cap)  # [neg_cap]
    n_neg = jnp.minimum(T - n_pos, n_neg_avail)

    # Slot layout: [0, n_pos) positives, [n_pos, n_pos + n_neg) negatives.
    slots = jnp.arange(T)
    is_pos_slot = slots < n_pos
    is_valid_slot = slots < n_pos + n_neg
    pos_for_slot = pos_idx[jnp.minimum(slots, pos_cap - 1)]
    neg_for_slot = neg_idx[jnp.clip(slots - n_pos, 0, neg_cap - 1)]
    roi_for_slot = jnp.where(is_pos_slot, pos_for_slot, neg_for_slot)

    rois = jnp.where(is_valid_slot[:, None], proposals[roi_for_slot], 0.0)

    # GT assignment by argmax IoU (positives only).
    gt_assign = jnp.argmax(overlaps[roi_for_slot], axis=1)  # [T]
    assigned_gt_boxes = jnp.where(
        is_pos_slot[:, None], gt_boxes[gt_assign], 0.0
    )
    class_ids = jnp.where(is_pos_slot, gt_class_ids[gt_assign], 0).astype(jnp.int32)

    deltas = B.encode_deltas(rois, assigned_gt_boxes) / jnp.asarray(
        bbox_std_dev, jnp.float32
    )
    deltas = jnp.where(is_pos_slot[:, None], deltas, 0.0)

    # Crop assigned GT masks to mask_shape for positive slots only
    # (positives always occupy the first pos_cap slots).
    crop_boxes = rois[:pos_cap]
    if use_mini_mask:
        # Mini-masks cover exactly the GT box, so express the ROI in the GT
        # box's normalized frame (padded slots: extent clamped, result
        # zeroed by the positive-slot mask below).
        gt_b = assigned_gt_boxes[:pos_cap]
        corner = jnp.concatenate([gt_b[:, :3], gt_b[:, :3]], axis=1)
        extent = jnp.concatenate(
            [gt_b[:, 3:] - gt_b[:, :3], gt_b[:, 3:] - gt_b[:, :3]], axis=1)
        crop_boxes = (crop_boxes - corner) / jnp.maximum(extent, 1e-6)
    masks_t = jnp.transpose(gt_masks, (3, 0, 1, 2))[..., None].astype(jnp.float32)
    crop = crop_and_resize_3d(
        masks_t,
        crop_boxes,
        gt_assign[:pos_cap].astype(jnp.int32),
        mask_shape,
    )[..., 0]                                               # [pos_cap, *mask_shape]
    crop = jnp.round(crop)
    masks = jnp.zeros((T, *mask_shape), jnp.float32)
    masks = masks.at[:pos_cap].set(
        jnp.where(is_pos_slot[:pos_cap, None, None, None], crop, 0.0)
    )

    return {
        "rois": rois,
        "gt_boxes": assigned_gt_boxes,
        "class_ids": class_ids,
        "deltas": deltas,
        "masks": masks,
        "pos_count": n_pos,
        "valid": is_valid_slot,
    }


def detection_targets_batch(key, proposals, gt_class_ids, gt_boxes, gt_masks,
                            bbox_std_dev, train_rois_per_image,
                            roi_positive_ratio, positive_iou_threshold,
                            negative_iou_threshold, mask_shape=(28, 28, 28),
                            use_mini_mask=False):
    """vmapped-over-batch wrapper. proposals: [B,P,6], gt_*: [B,...]."""
    bsz = proposals.shape[0]
    keys = jax.random.split(key, bsz)
    fn = functools.partial(
        detection_targets,
        bbox_std_dev=bbox_std_dev,
        train_rois_per_image=train_rois_per_image,
        roi_positive_ratio=roi_positive_ratio,
        positive_iou_threshold=positive_iou_threshold,
        negative_iou_threshold=negative_iou_threshold,
        mask_shape=mask_shape,
        use_mini_mask=use_mini_mask,
    )
    return jax.vmap(fn)(keys, proposals, gt_class_ids, gt_boxes, gt_masks)

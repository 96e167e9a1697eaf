"""Loss functions (pure jnp, fixed shapes, mask-based selection).

Parity with the reference losses (core/models.py:1583-1960), including their
non-standard details:

- rpn_class_loss: softmax CE on +-1 anchors with focal modulation
  (1-p_t)^1.5 and alpha=0.9 positive weighting.
- rpn_bbox_loss: Huber with separate XY (delta=1.0) and Z (delta=0.5,
  half-weighted) branches, prediction clip +-5, diff clip +-2.
- mrcnn_class_loss: focal gamma=3 alpha=0.85, active-class masking, 2x
  penalty for confident false positives, weight-sum normalization.
- mrcnn_bbox_loss: soft clip 3*tanh(pred/3) then Huber delta=1.
- mrcnn_mask_loss: per-class gather, empty-target filtering,
  0.3*BCE + 0.7*Dice.

Each returns (scalar_loss, metrics_dict). The reference streams sampled
tf.Print diagnostics (its documented observability contract,
README.md:173-196); we return the same quantities as metrics for the
telemetry subsystem to log every step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def _safe_mean(x, mask, axis=None):
    """Mean of x over mask-selected entries (0 if none selected)."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1.0)


def rpn_class_loss(rpn_match, rpn_class_logits, alpha: float = 0.90,
                   gamma: float = 1.5):
    """rpn_match: [B, A] int {1, -1, 0}; logits: [B, A, 2]."""
    rpn_match = jnp.asarray(rpn_match)
    if rpn_match.ndim == 3:
        rpn_match = rpn_match[..., 0]
    logits = jnp.asarray(rpn_class_logits, jnp.float32)

    selected = rpn_match != 0
    labels = (rpn_match == 1).astype(jnp.int32)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(-ce)
    focal = jnp.power(1.0 - p_t, gamma) * ce
    alpha_t = jnp.where(labels == 1, alpha, 1.0 - alpha)
    loss = _safe_mean(alpha_t * focal, selected)

    n_pos = jnp.sum((rpn_match == 1).astype(jnp.int32))
    n_neg = jnp.sum((rpn_match == -1).astype(jnp.int32))
    return loss, {
        "rpn_class_loss": loss,
        "rpn_n_pos": n_pos,
        "rpn_n_neg": n_neg,
        "rpn_ce_mean": _safe_mean(focal, selected),
    }


def rpn_bbox_loss(target_bbox, rpn_match, rpn_bbox):
    """target_bbox: [B, A_train, 6] packed positives-first (per image, in
    anchor order — matching build_rpn_targets); rpn_match: [B, A];
    rpn_bbox: [B, A, 6] predictions.

    The reference packs predicted deltas of positive anchors (in anchor
    order) against the packed targets (core/models.py:1629-1673
    batch_pack_graph); we realize the same pairing with a fixed-shape
    ranking: the r-th positive anchor of image b pairs with target row r.
    """
    rpn_match = jnp.asarray(rpn_match)
    if rpn_match.ndim == 3:
        rpn_match = rpn_match[..., 0]
    pred = jnp.clip(jnp.asarray(rpn_bbox, jnp.float32), -5.0, 5.0)
    target = jnp.asarray(target_bbox, jnp.float32)

    pos = rpn_match == 1  # [B, A]
    a_train = target.shape[1]

    # Rank of each positive anchor within its image (anchor order).
    rank = jnp.cumsum(pos.astype(jnp.int32), axis=1) - 1  # [B, A]
    rank = jnp.clip(rank, 0, a_train - 1)
    matched_target = jnp.take_along_axis(
        target, rank[..., None], axis=1
    )  # [B, A, 6]

    diff = jnp.clip(matched_target - pred, -2.0, 2.0)
    abs_diff = jnp.abs(diff)

    xy_mask = jnp.asarray([1., 1., 0., 1., 1., 0.], jnp.float32)
    z_mask = jnp.asarray([0., 0., 1., 0., 0., 1.], jnp.float32)
    huber_xy = jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5) * xy_mask
    huber_z = jnp.where(abs_diff < 0.5, 0.5 * diff * diff,
                        0.5 * abs_diff - 0.25) * z_mask
    huber = huber_xy + huber_z  # [B, A, 6]

    loss = _safe_mean(jnp.mean(huber, axis=-1), pos)
    return loss, {"rpn_bbox_loss": loss}


def mrcnn_class_loss(target_class_ids, pred_class_logits, active_class_ids,
                     gamma: float = 3.0, alpha: float = 0.85,
                     fp_conf_threshold: float = 0.5,
                     fp_penalty: float = 2.0):
    """targets: [B, T] int; logits: [B, T, C]; active: [B, C]."""
    target = jnp.asarray(target_class_ids, jnp.int32)
    logits = jnp.clip(jnp.asarray(pred_class_logits, jnp.float32), -10.0, 10.0)
    b, t, c = logits.shape
    # Out-of-range class ids (e.g. multi-class synthetic data with a
    # single-class config) would make the gathers below undefined.
    target = jnp.clip(target, 0, c - 1)

    # Background column always active (core/models.py:1691-1695).
    active = jnp.asarray(active_class_ids, jnp.float32)
    active = jnp.concatenate([jnp.ones_like(active[:, :1]), active[:, 1:]], axis=1)
    true_active = jnp.take_along_axis(
        active[:, None, :].repeat(t, axis=1), target[..., None], axis=2
    )[..., 0]  # [B, T]

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    ce = -jnp.take_along_axis(log_probs, target[..., None], axis=-1)[..., 0]
    pt = jnp.clip(jnp.exp(-ce), EPS, 1.0 - EPS)
    focal = jnp.power(1.0 - pt, gamma) * ce

    is_fg = (target > 0).astype(jnp.float32)
    class_weights = is_fg * alpha + (1.0 - is_fg) * (1.0 - alpha)

    max_fg_prob = jnp.max(probs[..., 1:], axis=-1)
    confident_fp = ((target == 0) & (max_fg_prob > fp_conf_threshold)).astype(
        jnp.float32
    )
    focal = focal * (1.0 + confident_fp * (fp_penalty - 1.0))
    weighted = focal * class_weights * true_active

    weight_sum = jnp.maximum(jnp.sum(class_weights * true_active), EPS)
    loss = jnp.sum(weighted) / weight_sum

    # Diagnostics (observability contract, README.md:178-182).
    pred_labels = jnp.argmax(logits, axis=-1)
    pos_mask = is_fg > 0.5
    neg_mask = is_fg <= 0.5
    metrics = {
        "mrcnn_class_loss": loss,
        "class_pos_count": jnp.sum(pos_mask.astype(jnp.int32)),
        "class_fg_prob": _safe_mean(pt, pos_mask),
        "class_pos_acc": _safe_mean(
            (pred_labels == target).astype(jnp.float32), pos_mask),
        "class_bg_acc": _safe_mean(
            (pred_labels == 0).astype(jnp.float32), neg_mask),
        "class_confident_fp": jnp.sum(confident_fp),
    }
    return loss, metrics


def mrcnn_bbox_loss(target_bbox, target_class_ids, pred_bbox):
    """targets: [B, T, 6]; class ids: [B, T]; pred: [B, T, C, 6]."""
    target = jnp.asarray(target_bbox, jnp.float32)
    cls = jnp.asarray(target_class_ids, jnp.int32)
    pred = jnp.asarray(pred_bbox, jnp.float32)
    cls = jnp.clip(cls, 0, pred.shape[2] - 1)

    pred_cls = jnp.take_along_axis(
        pred, cls[..., None, None].repeat(6, axis=-1), axis=2
    )[:, :, 0, :]  # [B, T, 6]
    pred_cls = 3.0 * jnp.tanh(pred_cls / 3.0)

    abs_diff = jnp.abs(target - pred_cls)
    huber = jnp.where(abs_diff <= 1.0, 0.5 * abs_diff * abs_diff,
                      abs_diff - 0.5)
    per_roi = jnp.mean(huber, axis=-1)  # [B, T]

    pos = cls > 0
    loss = _safe_mean(per_roi, pos)
    metrics = {
        "mrcnn_bbox_loss": loss,
        "bbox_mean_err": _safe_mean(jnp.mean(abs_diff, -1), pos),
        "bbox_max_err": jnp.max(
            jnp.where(pos[..., None], abs_diff, 0.0)),
        "bbox_pct_large": _safe_mean(
            jnp.mean((abs_diff > 2.0).astype(jnp.float32), -1), pos),
    }
    return loss, metrics


def mrcnn_mask_loss(target_masks, target_class_ids, pred_masks,
                    bce_weight: float = 0.3, dice_weight: float = 0.7):
    """targets: [B, T, m, m, m]; class ids: [B, T]; pred: [B, T, m, m, m, C]
    (sigmoid probabilities)."""
    yt = jnp.asarray(target_masks, jnp.float32)
    cls = jnp.asarray(target_class_ids, jnp.int32)
    yp = jnp.asarray(pred_masks, jnp.float32)
    b, t = yt.shape[:2]
    v = yt.shape[2] * yt.shape[3] * yt.shape[4]

    yt = yt.reshape(b, t, v)
    c = yp.shape[-1]
    yp = yp.reshape(b, t, v, c)
    cls = jnp.clip(cls, 0, c - 1)
    yp_cls = jnp.take_along_axis(
        yp, cls[..., None, None].repeat(v, axis=2), axis=3
    )[..., 0]  # [B, T, V]
    yp_cls = jnp.clip(yp_cls, EPS, 1.0 - EPS)

    pos = cls > 0
    nonempty = jnp.sum(yt, axis=-1) > 0
    valid = jnp.logical_and(pos, nonempty)  # [B, T]

    bce = -(yt * jnp.log(yp_cls) + (1.0 - yt) * jnp.log(1.0 - yp_cls))
    bce_loss = _safe_mean(jnp.mean(bce, axis=-1), valid)

    smooth = 1.0
    inter = jnp.sum(yt * yp_cls, axis=-1)
    union = jnp.sum(yt, axis=-1) + jnp.sum(yp_cls, axis=-1)
    dice = (2.0 * inter + smooth) / (union + smooth)
    dice_mean = _safe_mean(dice, valid)
    dice_loss = 1.0 - dice_mean

    # Zero loss when no valid positive targets (reference returns 0 through
    # its tf.cond branches, core/models.py:1894, 1913).
    any_valid = (jnp.sum(valid.astype(jnp.int32)) > 0).astype(jnp.float32)
    loss = (bce_weight * bce_loss + dice_weight * dice_loss) * any_valid

    metrics = {
        "mrcnn_mask_loss": loss,
        "mask_dice": dice_mean,
        "mask_bce": bce_loss,
        "mask_fg_pred": _safe_mean(jnp.mean(yp_cls, -1), valid),
        "mask_fg_true": _safe_mean(jnp.mean(yt, -1), valid),
        "mask_valid_count": jnp.sum(valid.astype(jnp.int32)),
    }
    return loss, metrics

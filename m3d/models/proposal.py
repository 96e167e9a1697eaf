"""Proposal generation: scores + deltas + anchors -> fixed-P NMS'd proposals.

Parity with the reference ProposalLayer (core/models.py:369-504): take the
top PRE_NMS_LIMIT anchors by foreground score, de-standardize deltas and clip
to +-3, apply to anchors (result clipped to [0,1] — core/models.py:280-337),
enforce min sizes (eps in y/x, 1/IMAGE_DEPTH in z), greedy 3D NMS at
RPN_NMS_THRESHOLD, pad to ``proposal_count`` with zero boxes.

TPU design: per-image work is vmapped over the batch (replacing
utils.batch_slice); all shapes static; NMS is the fixed-shape m3d.ops kernel.
Returns proposals sorted by descending score — downstream consumers rely on
this ordering (reference: core/models.py:1261-1270 limit_rois).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from m3d import boxes as B
from m3d.ops.nms3d import nms_3d


@functools.partial(
    jax.jit,
    static_argnames=("proposal_count", "pre_nms_limit", "image_depth"),
)
def generate_proposals(rpn_probs, rpn_deltas, anchors, rpn_bbox_std_dev,
                       proposal_count: int, nms_threshold, pre_nms_limit: int,
                       image_depth: int):
    """Args:
      rpn_probs: [B, A, 2] softmax fg/bg scores.
      rpn_deltas: [B, A, 6] standardized deltas.
      anchors: [A, 6] normalized anchors (shared across batch).
      rpn_bbox_std_dev: [6].
      proposal_count / pre_nms_limit / image_depth: static ints.

    Returns:
      proposals: [B, proposal_count, 6] normalized, zero-padded.
      valid: [B, proposal_count] bool.
    """
    scores = jnp.asarray(rpn_probs, jnp.float32)[..., 1]  # [B, A]
    deltas = jnp.asarray(rpn_deltas, jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    std = jnp.asarray(rpn_bbox_std_dev, jnp.float32)

    deltas = jnp.clip(deltas * std, -3.0, 3.0)
    k = min(pre_nms_limit, anchors.shape[0])
    min_z = max(1.0 / max(float(image_depth), 1.0), 1e-4)

    def per_image(scores_i, deltas_i):
        top_scores, top_idx = jax.lax.top_k(scores_i, k)
        top_deltas = deltas_i[top_idx]
        top_anchors = anchors[top_idx]

        # apply deltas (no extra log clip — deltas already in [-3, 3]),
        # then clip to the unit window (core/models.py:280-337).
        boxes = B.apply_deltas(top_anchors, top_deltas, clip_log_scale=False)
        boxes = jnp.clip(boxes, 0.0, 1.0)
        boxes = B.enforce_min_size(boxes, min_yx=1e-6, min_z=min_z)

        idx, valid = nms_3d(boxes, top_scores, nms_threshold,
                            max_output=proposal_count)
        props = jnp.where(valid[:, None], boxes[idx], 0.0)
        return props, valid

    return jax.vmap(per_image)(scores, deltas)

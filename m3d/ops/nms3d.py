"""3D greedy non-max suppression, XLA-native with fixed shapes.

Replaces the reference's compiled C++/CUDA ``NonMaxSuppression3D`` custom op
(reference: core/custom_op/custom_op.py:22-26; exact semantics documented by
the numpy fallback at core/utils.py:505-578): sort boxes by score descending,
greedily keep a box unless IoU with an already-kept box exceeds ``threshold``,
return up to ``max_output`` kept indices.

TPU design: greedy NMS is inherently sequential, so we run a *blockwise*
suppression — boxes are processed in score order in blocks of ``block_size``;
within a block a small ``fori_loop`` resolves the sequential dependency on a
[B, B] IoU tile, then one vectorized [B, N] pass propagates suppression from
the block's kept boxes to all later boxes. Sequential depth stays O(N) but
each inner step touches only a [B] vector, and all heavy IoU work is
vectorized. Shapes are static: returns exactly ``max_output`` indices plus a
validity mask (XLA-friendly padded+mask datatype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from m3d.boxes import box_volume

# np.float32, not jnp: jnp.float32(x) materializes a device array, which
# initializes the JAX backend at import time (before platform selection).
NEG_INF = np.float32(-1e30)


def _pairwise_iou(boxes_a, boxes_b, vol_a, vol_b, eps=1e-10):
    """IoU between [A,6] and [B,6] with precomputed volumes -> [A,B]."""
    y1 = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    x1 = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    z1 = jnp.maximum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y2 = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
    x2 = jnp.minimum(boxes_a[:, None, 4], boxes_b[None, :, 4])
    z2 = jnp.minimum(boxes_a[:, None, 5], boxes_b[None, :, 5])
    inter = (
        jnp.maximum(y2 - y1, 0.0)
        * jnp.maximum(x2 - x1, 0.0)
        * jnp.maximum(z2 - z1, 0.0)
    )
    union = jnp.maximum(vol_a[:, None] + vol_b[None, :] - inter, eps)
    return inter / union


# Above this sorted-candidate count the O(N^2) suppression matrix of the
# fixpoint algorithm gets too large; fall back to blockwise greedy.
FIXPOINT_MAX_N = 16384


@functools.partial(jax.jit, static_argnames=("max_output",))
def nms_3d_fixpoint(boxes, scores, iou_threshold, max_output: int,
                    valid=None, max_rounds: int = 64):
    """Greedy NMS via parallel fixpoint iteration — the TPU-native algorithm.

    Sort by score, build the triangular suppression mask
    ``M[j, i] = (j before i) & (IoU > thr)`` once (O(N^2) vectorized), then
    iterate ``alive <- ~(alive @ M)`` until the fixpoint. The fixpoint is
    exactly the greedy-NMS keep set (alternating-monotone iteration, settles
    one suppression-chain level per round; chains are a handful deep in
    practice). Each round is ONE [N]x[N,N] matvec on the MXU instead of the
    per-box sequential scan — ~10 rounds replace N sequential steps.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    vols = box_volume(boxes_s)
    alive0 = scores_s > NEG_INF / 2

    iou = _pairwise_iou(boxes_s, boxes_s, vols, vols)  # [N, N]
    pos = jnp.arange(n)
    earlier = pos[:, None] < pos[None, :]  # j strictly before i (ties by index)
    sup = jnp.logical_and(iou > iou_threshold, earlier)  # [N(j), N(i)]
    sup_f = sup.astype(jnp.bfloat16)

    def cond(state):
        t, alive, changed = state
        return jnp.logical_and(changed, t < max_rounds)

    def body(state):
        t, alive, _ = state
        killed = (
            jnp.dot(alive.astype(jnp.bfloat16), sup_f,
                    preferred_element_type=jnp.float32) > 0.5
        )
        new_alive = jnp.logical_and(~killed, alive0)
        return t + 1, new_alive, jnp.any(new_alive != alive)

    _, alive, _ = jax.lax.while_loop(cond, body, (0, alive0, True))

    key = jnp.where(alive, -pos.astype(jnp.float32), NEG_INF)
    _, sel = jax.lax.top_k(key, min(max_output, n))
    out_valid = alive[sel]
    indices = jnp.where(out_valid, order[sel], 0)
    if max_output > n:
        pad = max_output - n
        indices = jnp.concatenate([indices, jnp.zeros(pad, indices.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros(pad, bool)])
    return indices.astype(jnp.int32), out_valid


def nms_3d(boxes, scores, iou_threshold, max_output: int, valid=None,
           block_size: int = 128):
    """Greedy 3D NMS — dispatches to the fixpoint algorithm when the
    suppression matrix fits, else the blockwise-greedy kernel."""
    if boxes.shape[0] <= FIXPOINT_MAX_N:
        return nms_3d_fixpoint(boxes, scores, iou_threshold, max_output,
                               valid=valid)
    return nms_3d_blockwise(boxes, scores, iou_threshold, max_output,
                            valid=valid, block_size=block_size)


@functools.partial(jax.jit, static_argnames=("max_output", "block_size"))
def nms_3d_blockwise(boxes, scores, iou_threshold, max_output: int, valid=None,
                     block_size: int = 128):
    """Greedy 3D NMS over padded inputs.

    Args:
      boxes: [N, 6] float (y1,x1,z1,y2,x2,z2), any consistent coordinate space.
      scores: [N] float.
      iou_threshold: scalar float; boxes with IoU > threshold w.r.t. a kept
        higher-scored box are suppressed (reference keeps IoU <= threshold,
        core/utils.py:572).
      max_output: static int K.
      valid: optional [N] bool; False entries never selected.
      block_size: static int B, the sequential-resolution tile.

    Returns:
      indices: [K] int32 indices into `boxes` in descending score order,
        padded with 0.
      out_valid: [K] bool marking real selections.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    n = boxes.shape[0]

    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    # Pad N to a multiple of block_size (and to >= max_output so the final
    # top_k is well-defined) with -inf scores.
    n_min = max(n, max_output)
    n_pad = (n_min - n) + ((-n_min) % block_size)
    if n_pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((n_pad, 6), boxes.dtype)], axis=0)
        scores = jnp.concatenate([scores, jnp.full((n_pad,), NEG_INF)], axis=0)
    n_total = n + n_pad
    num_blocks = n_total // block_size

    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    vols = box_volume(boxes_s)
    alive0 = scores_s > NEG_INF / 2  # padding / invalid never kept

    def block_body(bi, state):
        suppressed, kept = state
        start = bi * block_size
        blk_boxes = jax.lax.dynamic_slice_in_dim(boxes_s, start, block_size)
        blk_vols = jax.lax.dynamic_slice_in_dim(vols, start, block_size)
        blk_sup = jax.lax.dynamic_slice_in_dim(suppressed, start, block_size)
        blk_alive = jax.lax.dynamic_slice_in_dim(alive0, start, block_size)

        # Resolve in-block sequential dependency on the [B, B] IoU tile.
        iou_bb = _pairwise_iou(blk_boxes, blk_boxes, blk_vols, blk_vols)
        sup_mask = iou_bb > iou_threshold  # [B, B]; row suppresses column

        def inner(r, carry):
            blk_sup_c, blk_kept_c = carry
            keep_r = jnp.logical_and(~blk_sup_c[r], blk_alive[r])
            blk_kept_c = blk_kept_c.at[r].set(keep_r)
            # Suppress later rows in the block (strictly lower score order).
            later = jnp.arange(block_size) > r
            newly = jnp.logical_and(jnp.logical_and(keep_r, later), sup_mask[r])
            return jnp.logical_or(blk_sup_c, newly), blk_kept_c

        blk_sup, blk_kept = jax.lax.fori_loop(
            0, block_size, inner, (blk_sup, jnp.zeros((block_size,), bool))
        )

        # Propagate suppression from this block's kept boxes to ALL later boxes
        # in one vectorized [B, N] pass.
        iou_bn = _pairwise_iou(blk_boxes, boxes_s, blk_vols, vols)  # [B, N]
        kills = jnp.any(
            jnp.logical_and(blk_kept[:, None], iou_bn > iou_threshold), axis=0
        )
        pos = jnp.arange(n_total)
        kills = jnp.logical_and(kills, pos >= start + block_size)
        suppressed = jnp.logical_or(suppressed, kills)
        kept = jax.lax.dynamic_update_slice_in_dim(kept, blk_kept, start, axis=0)
        return suppressed, kept

    suppressed0 = jnp.zeros((n_total,), bool)
    kept0 = jnp.zeros((n_total,), bool)
    _, kept = jax.lax.fori_loop(0, num_blocks, block_body, (suppressed0, kept0))

    # Select first K kept boxes (already in score order).
    # top_k over kept-flag-majored key preserves score order among kept.
    key = jnp.where(kept, -jnp.arange(n_total, dtype=jnp.float32), NEG_INF)
    _, sel = jax.lax.top_k(key, max_output)
    out_valid = kept[sel]
    indices = jnp.where(out_valid, jnp.minimum(order[sel], n - 1), 0)
    return indices.astype(jnp.int32), out_valid


def nms_3d_numpy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
                 max_output: int):
    """Plain-numpy greedy NMS oracle (semantics of core/utils.py:505-578)."""
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32)
    vols = (
        (boxes[:, 3] - boxes[:, 0])
        * (boxes[:, 4] - boxes[:, 1])
        * (boxes[:, 5] - boxes[:, 2])
    )
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0 and len(keep) < max_output:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        yy1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        xx1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        zz1 = np.maximum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        xx2 = np.minimum(boxes[i, 4], boxes[rest, 4])
        zz2 = np.minimum(boxes[i, 5], boxes[rest, 5])
        inter = (
            np.maximum(yy2 - yy1, 0) * np.maximum(xx2 - xx1, 0) * np.maximum(zz2 - zz1, 0)
        )
        union = np.maximum(vols[i] + vols[rest] - inter, 1e-10)
        iou = inter / union
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int32)

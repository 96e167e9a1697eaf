"""3D box math, pure jnp.

Boxes are ``(y1, x1, z1, y2, x2, z2)``. Normalized coordinates divide pixel
coordinates by ``(H, W, D)`` with no ``-1`` shift (reference:
core/models.py:7574-7591, core/utils.py:201-226). Deltas are
``(dy, dx, dz, log dh, log dw, log dd)`` relative to the box center/size
(reference: core/utils.py:412-464, 616-651).

Everything here is shape-polymorphic jnp usable under jit/vmap; numpy arrays
work too (jnp dispatches). These functions are oracled against fresh numpy
implementations in tests/test_boxes.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Matterport-style log-scale clamp (reference: core/utils.py:443-446).
# math.log, not jnp.log: a module-level jnp call would initialize the JAX
# backend at import time, before callers can select a platform.
LOG_SCALE_LIMIT = math.log(1000.0 / 16.0)


def box_hwd(boxes):
    """Per-box (h, w, d) extents. boxes: [..., 6]."""
    h = boxes[..., 3] - boxes[..., 0]
    w = boxes[..., 4] - boxes[..., 1]
    d = boxes[..., 5] - boxes[..., 2]
    return h, w, d


def box_volume(boxes):
    h, w, d = box_hwd(boxes)
    return h * w * d


def overlaps_3d(boxes1, boxes2, eps: float = 1e-10):
    """Broadcasted pairwise 3D IoU: [N, 6] x [M, 6] -> [N, M].

    Reference: core/models.py:695-733 (overlaps_graph) and
    core/utils.py:78-144 (compute_overlaps_3d). Unlike the numpy oracle we do
    not corner-normalize here; inputs are assumed well-formed (y2>=y1 etc.),
    which all callers guarantee by construction.
    """
    b1 = jnp.asarray(boxes1, jnp.float32)[:, None, :]  # [N,1,6]
    b2 = jnp.asarray(boxes2, jnp.float32)[None, :, :]  # [1,M,6]

    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    z1 = jnp.maximum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    x2 = jnp.minimum(b1[..., 4], b2[..., 4])
    z2 = jnp.minimum(b1[..., 5], b2[..., 5])

    inter = (
        jnp.maximum(y2 - y1, 0.0)
        * jnp.maximum(x2 - x1, 0.0)
        * jnp.maximum(z2 - z1, 0.0)
    )
    vol1 = box_volume(b1)
    vol2 = box_volume(b2)
    union = jnp.maximum(vol1 + vol2 - inter, eps)
    return jnp.clip(inter / union, 0.0, 1.0)


def apply_deltas(boxes, deltas, clip_log_scale: bool = True):
    """Apply (dy,dx,dz,ldh,ldw,ldd) deltas to boxes. [..., 6] x [..., 6] -> [..., 6].

    Deltas must already be de-standardized (multiplied by BBOX_STD_DEV) by the
    caller. Reference: core/utils.py:412-464 (apply_box_deltas_3d_graph).
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)

    h, w, d = box_hwd(boxes)
    cy = boxes[..., 0] + 0.5 * h
    cx = boxes[..., 1] + 0.5 * w
    cz = boxes[..., 2] + 0.5 * d

    dh, dw, dd = deltas[..., 3], deltas[..., 4], deltas[..., 5]
    if clip_log_scale:
        dh = jnp.clip(dh, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)
        dw = jnp.clip(dw, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)
        dd = jnp.clip(dd, -LOG_SCALE_LIMIT, LOG_SCALE_LIMIT)

    cy = cy + deltas[..., 0] * h
    cx = cx + deltas[..., 1] * w
    cz = cz + deltas[..., 2] * d
    h = h * jnp.exp(dh)
    w = w * jnp.exp(dw)
    d = d * jnp.exp(dd)

    y1 = cy - 0.5 * h
    x1 = cx - 0.5 * w
    z1 = cz - 0.5 * d
    return jnp.stack([y1, x1, z1, y1 + h, x1 + w, z1 + d], axis=-1)


def encode_deltas(boxes, gt_boxes, eps: float = 1e-6):
    """Deltas taking ``boxes`` to ``gt_boxes`` (inverse of apply_deltas).

    Reference: core/utils.py:616-651 (box_refinement_graph). The caller
    divides by BBOX_STD_DEV.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    gt_boxes = jnp.asarray(gt_boxes, jnp.float32)

    h, w, d = box_hwd(boxes)
    cy = boxes[..., 0] + 0.5 * h
    cx = boxes[..., 1] + 0.5 * w
    cz = boxes[..., 2] + 0.5 * d

    gh, gw, gd = box_hwd(gt_boxes)
    gcy = gt_boxes[..., 0] + 0.5 * gh
    gcx = gt_boxes[..., 1] + 0.5 * gw
    gcz = gt_boxes[..., 2] + 0.5 * gd

    dy = (gcy - cy) / jnp.maximum(h, eps)
    dx = (gcx - cx) / jnp.maximum(w, eps)
    dz = (gcz - cz) / jnp.maximum(d, eps)
    dh = jnp.log(jnp.maximum(gh, eps) / jnp.maximum(h, eps))
    dw = jnp.log(jnp.maximum(gw, eps) / jnp.maximum(w, eps))
    dd = jnp.log(jnp.maximum(gd, eps) / jnp.maximum(d, eps))
    return jnp.stack([dy, dx, dz, dh, dw, dd], axis=-1)


def norm_boxes(boxes, image_shape, clip: bool = True):
    """Pixel -> normalized [0,1] by dividing by (H, W, D) — no -1 shift.

    Reference: core/utils.py:201-213 (norm_boxes_3d_graph).
    image_shape: (H, W, D) scalars or arrays broadcastable to boxes' batch.
    """
    h, w, d = (jnp.asarray(s, jnp.float32) for s in image_shape[:3])
    scale = jnp.stack([h, w, d, h, w, d], axis=-1)
    out = jnp.asarray(boxes, jnp.float32) / scale
    return jnp.clip(out, 0.0, 1.0) if clip else out


def denorm_boxes(boxes, image_shape):
    """Normalized [0,1] -> pixel (float; caller rounds if needed).

    Reference: core/utils.py:215-226 (denorm_boxes_3d_graph).
    """
    h, w, d = (jnp.asarray(s, jnp.float32) for s in image_shape[:3])
    scale = jnp.stack([h, w, d, h, w, d], axis=-1)
    return jnp.asarray(boxes, jnp.float32) * scale


def clip_to_window(boxes, window=(0.0, 0.0, 0.0, 1.0, 1.0, 1.0)):
    """Clip boxes to a (y1,x1,z1,y2,x2,z2) window.

    Reference: core/models.py:343-366 (clip_boxes_graph).
    """
    wy1, wx1, wz1, wy2, wx2, wz2 = (float(v) for v in window)
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    z1 = jnp.clip(boxes[..., 2], wz1, wz2)
    y2 = jnp.clip(boxes[..., 3], wy1, wy2)
    x2 = jnp.clip(boxes[..., 4], wx1, wx2)
    z2 = jnp.clip(boxes[..., 5], wz1, wz2)
    return jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)


def enforce_min_size(boxes, min_yx: float = 1e-6, min_z: float = 1e-4):
    """Push y2/x2/z2 up so each box has positive extent.

    The z minimum is 1/IMAGE_DEPTH in normalized coordinates (reference:
    core/models.py:435-447 in ProposalLayer, 623-632 in PyramidROIAlign).
    """
    y1, x1, z1 = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    y2 = jnp.maximum(boxes[..., 3], y1 + min_yx)
    x2 = jnp.maximum(boxes[..., 4], x1 + min_yx)
    z2 = jnp.maximum(boxes[..., 5], z1 + min_z)
    return jnp.stack([y1, x1, z1, y2, x2, z2], axis=-1)

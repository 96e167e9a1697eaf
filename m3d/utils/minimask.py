"""Mini-mask machinery: store instance masks cropped+resized to a small cube.

Parity with the reference (core/utils.py:694-1019 minimize_mask /
expand_mask / resize): masks are cropped to their GT boxes and resized to
MINI_MASK_SHAPE to save memory; expansion inverts it. All shipped configs
run USE_MINI_MASK=false, but the capability is part of the surface
(config.py:28-29, detection_targets mini-mask branch core/models.py:977-989).
"""

from __future__ import annotations

import numpy as np

from m3d.utils.unmold import resize_trilinear


def minimize_mask(bbox, mask, mini_shape):
    """Crop masks to their boxes and resize to mini_shape.

    bbox: [N, 6] pixel boxes; mask: [H, W, D, N]; returns
    [mini_h, mini_w, mini_d, N] bool.
    """
    n = mask.shape[-1]
    mini = np.zeros(tuple(mini_shape) + (n,), bool)
    for i in range(n):
        y1, x1, z1, y2, x2, z2 = (int(v) for v in bbox[i][:6])
        crop = mask[y1:y2, x1:x2, z1:z2, i].astype(np.float32)
        if crop.size == 0:
            continue
        mini[..., i] = resize_trilinear(crop, mini_shape) >= 0.5
    return mini


def expand_mask(bbox, mini_mask, image_shape):
    """Inverse of minimize_mask: paste resized crops back into full volumes."""
    n = mini_mask.shape[-1]
    full = np.zeros(tuple(image_shape[:3]) + (n,), bool)
    for i in range(n):
        y1, x1, z1, y2, x2, z2 = (int(v) for v in bbox[i][:6])
        h, w, d = y2 - y1, x2 - x1, z2 - z1
        if h <= 0 or w <= 0 or d <= 0:
            continue
        crop = resize_trilinear(mini_mask[..., i].astype(np.float32),
                                (h, w, d)) >= 0.5
        full[y1:y2, x1:x2, z1:z2, i] = crop
    return full

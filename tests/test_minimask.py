"""Mini-mask minimize/expand (reference core/utils.py:694-1019)."""

import numpy as np

from m3d.utils.minimask import expand_mask, minimize_mask


def _volume_with_boxes(rng, shape=(48, 48, 24), n=3):
    masks = np.zeros(shape + (n,), bool)
    boxes = []
    for i in range(n):
        y1, x1, z1 = rng.randint(0, 24), rng.randint(0, 24), rng.randint(0, 8)
        dy, dx, dz = rng.randint(8, 20), rng.randint(8, 20), rng.randint(6, 12)
        y2, x2, z2 = min(y1 + dy, shape[0]), min(x1 + dx, shape[1]), \
            min(z1 + dz, shape[2])
        # an ellipsoid inside the box, so the mask has structure to survive
        # the down/up resize round trip
        yy, xx, zz = np.mgrid[y1:y2, x1:x2, z1:z2]
        cy, cx, cz = (y1 + y2) / 2, (x1 + x2) / 2, (z1 + z2) / 2
        ry, rx, rz = (y2 - y1) / 2, (x2 - x1) / 2, (z2 - z1) / 2
        masks[y1:y2, x1:x2, z1:z2, i] = (
            ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
            + ((zz - cz) / rz) ** 2
        ) <= 1.0
        boxes.append([y1, x1, z1, y2, x2, z2])
    return np.asarray(boxes), masks


def test_minimize_expand_roundtrip(rng):
    boxes, masks = _volume_with_boxes(rng)
    mini = minimize_mask(boxes, masks, (28, 28, 28))
    assert mini.shape == (28, 28, 28, masks.shape[-1])
    assert mini.dtype == bool
    back = expand_mask(boxes, mini, masks.shape[:3])
    # Round trip through a >=box-sized mini cube keeps instance Dice high.
    for i in range(masks.shape[-1]):
        a, b = masks[..., i], back[..., i]
        dice = 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)
        assert dice > 0.85, (i, dice)
        # expansion never paints outside the GT box
        outside = b.copy()
        y1, x1, z1, y2, x2, z2 = boxes[i]
        outside[y1:y2, x1:x2, z1:z2] = False
        assert not outside.any()


def test_minimize_empty_and_degenerate_boxes(rng):
    boxes = np.asarray([[0, 0, 0, 0, 0, 0], [5, 5, 5, 15, 15, 15]])
    masks = np.zeros((32, 32, 32, 2), bool)
    masks[5:15, 5:15, 5:15, 1] = True
    mini = minimize_mask(boxes, masks, (14, 14, 14))
    assert not mini[..., 0].any()
    assert mini[..., 1].any()
    back = expand_mask(boxes, mini, (32, 32, 32))
    assert not back[..., 0].any()
    assert back[..., 1].sum() > 0

"""crop_and_resize_3d vs a scipy/numpy trilinear oracle; pyramid routing."""

import numpy as np

from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.ops.roialign3d import (
    compute_roi_levels,
    crop_and_resize_3d,
    pyramid_roi_align,
)


def crop_resize_oracle(features, boxes, box_ind, crop_size, method="trilinear"):
    """TF-convention crop_and_resize oracle, plain numpy loops."""
    b, h, w, d, c = features.shape
    n = boxes.shape[0]
    py, px, pz = crop_size
    out = np.zeros((n, py, px, pz, c), np.float32)

    def axis_pos(lo, hi, size, p):
        if p > 1:
            return [lo * (size - 1) + i * (hi - lo) * (size - 1) / (p - 1)
                    for i in range(p)]
        return [0.5 * (lo + hi) * (size - 1)]

    for ni in range(n):
        y1, x1, z1, y2, x2, z2 = boxes[ni]
        img = features[box_ind[ni]]
        ys = axis_pos(y1, y2, h, py)
        xs = axis_pos(x1, x2, w, px)
        zs = axis_pos(z1, z2, d, pz)
        for i, yp in enumerate(ys):
            for j, xp in enumerate(xs):
                for k, zp in enumerate(zs):
                    if not (0 <= yp <= h - 1 and 0 <= xp <= w - 1 and 0 <= zp <= d - 1):
                        continue
                    if method == "nearest":
                        out[ni, i, j, k] = img[int(round(yp)), int(round(xp)), int(round(zp))]
                        continue
                    y0, x0, z0 = int(np.floor(yp)), int(np.floor(xp)), int(np.floor(zp))
                    y1i, x1i, z1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1), min(z0 + 1, d - 1)
                    wy, wx, wz = yp - y0, xp - x0, zp - z0
                    val = 0.0
                    for (cy, wyc) in ((y0, 1 - wy), (y1i, wy)):
                        for (cx, wxc) in ((x0, 1 - wx), (x1i, wx)):
                            for (cz, wzc) in ((z0, 1 - wz), (z1i, wz)):
                                val = val + img[cy, cx, cz] * wyc * wxc * wzc
                    out[ni, i, j, k] = val
    return out


def test_crop_and_resize_trilinear(rng):
    feats = rng.randn(2, 12, 10, 8, 3).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.0, 0.6, 0.9, 0.5],
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
            [0.4, 0.4, 0.4, 0.5, 0.5, 0.6],
        ],
        np.float32,
    )
    box_ind = np.array([0, 1, 0], np.int32)
    got = np.asarray(crop_and_resize_3d(feats, boxes, box_ind, (4, 4, 4)))
    want = crop_resize_oracle(feats, boxes, box_ind, (4, 4, 4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_crop_and_resize_nearest(rng):
    feats = rng.randn(1, 8, 8, 8, 2).astype(np.float32)
    boxes = np.array([[0.1, 0.1, 0.1, 0.8, 0.8, 0.8]], np.float32)
    box_ind = np.array([0], np.int32)
    got = np.asarray(crop_and_resize_3d(feats, boxes, box_ind, (3, 3, 3), "nearest"))
    want = crop_resize_oracle(feats, boxes, box_ind, (3, 3, 3), "nearest")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_out_of_range_extrapolates_zero(rng):
    feats = np.ones((1, 8, 8, 8, 1), np.float32)
    # Box extends beyond the volume -> outside samples are exactly 0.
    boxes = np.array([[-0.5, 0.0, 0.0, 1.5, 1.0, 1.0]], np.float32)
    got = np.asarray(
        crop_and_resize_3d(feats, boxes, np.array([0], np.int32), (5, 3, 3))
    )
    want = crop_resize_oracle(feats, boxes, np.array([0]), (5, 3, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got[0, 0].max() == 0.0  # fully out of range plane


def test_crop_single_cell():
    feats = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2, 1)
    boxes = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], np.float32)
    got = np.asarray(
        crop_and_resize_3d(feats, boxes, np.array([0], np.int32), (1, 1, 1))
    )
    # Single-cell crop samples the box center: mean of all 8 voxels.
    np.testing.assert_allclose(got[0, 0, 0, 0, 0], feats.mean(), atol=1e-5)


def test_roi_level_assignment():
    # Formula (reference: core/models.py:645-649):
    # lvl = clamp(4 + round(log2(cbrt(vol_norm) / (224 / cbrt(HWD)))), 2, 5).
    # On a 128^3 image: full-image ROI -> log2(128/224) ~= -0.81 -> P3 (idx 1);
    # a tiny ROI clamps to P2 (idx 0); a 224px-cube ROI would sit at P4.
    shape = (np.float32(128.0), np.float32(128.0), np.float32(128.0))
    big = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], np.float32)
    tiny = np.array([[0.0, 0.0, 0.0, 0.01, 0.01, 0.01]], np.float32)
    lv_big = int(np.asarray(compute_roi_levels(big, shape))[0])
    lv_tiny = int(np.asarray(compute_roi_levels(tiny, shape))[0])
    assert lv_big == 1  # P3
    assert lv_tiny == 0  # P2


def test_crop_and_resize_vjp_matches_numerical_gradient(rng):
    """The feature-gradient (CropAndResize3DGradImage equivalent) must match
    central finite differences — trilinear interpolation is linear in the
    features, so the VJP is exact and tolerances can be tight."""
    import jax
    import jax.numpy as jnp

    feats = rng.randn(1, 6, 6, 4, 2).astype(np.float32)
    boxes = np.array([[0.1, 0.15, 0.0, 0.7, 0.9, 0.8]], np.float32)
    box_ind = np.array([0], np.int32)
    cotangent = rng.randn(1, 3, 3, 3, 2).astype(np.float32)

    def scalar_fn(f):
        out = crop_and_resize_3d(f, boxes, box_ind, (3, 3, 3))
        return jnp.sum(out * cotangent)

    grad = np.asarray(jax.grad(scalar_fn)(jnp.asarray(feats)))

    eps = 1e-2  # linear in features -> exact for any eps
    num = np.zeros_like(feats)
    it = np.ndindex(*feats.shape)
    for idx in it:
        fp = feats.copy()
        fp[idx] += eps
        fm = feats.copy()
        fm[idx] -= eps
        num[idx] = (float(scalar_fn(jnp.asarray(fp)))
                    - float(scalar_fn(jnp.asarray(fm)))) / (2 * eps)
    np.testing.assert_allclose(grad, num, atol=5e-3, rtol=1e-3)


def test_pyramid_roi_align_stops_box_gradients(rng):
    """Box gradients are deliberately zero (reference stop_gradient at the
    ROIAlign call sites, core/models.py:660-661)."""
    import jax
    import jax.numpy as jnp

    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=16, NUM_CLASSES=2)
    meta = default_meta(cfg)[None]
    feats = [rng.randn(1, 16 >> i, 16 >> i, max(16 >> i, 2), 2
                       ).astype(np.float32) for i in range(4)]
    boxes = jnp.asarray([[[0.1, 0.1, 0.1, 0.6, 0.6, 0.6]]], jnp.float32)

    g = jax.grad(
        lambda b: jnp.sum(pyramid_roi_align(b, meta, feats, 3))
    )(boxes)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_pyramid_roi_align_matches_single_level(rng):
    """A ROI routed to level l must equal a direct crop from that level."""
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=16, NUM_CLASSES=2)
    meta = default_meta(cfg)[None]
    c = 4
    feats = [
        rng.randn(1, 16, 16, 16, c).astype(np.float32),
        rng.randn(1, 8, 8, 16, c).astype(np.float32),
        rng.randn(1, 4, 4, 16, c).astype(np.float32),
        rng.randn(1, 2, 2, 8, c).astype(np.float32),
    ]
    boxes = np.array([[[0.1, 0.1, 0.1, 0.3, 0.35, 0.6],
                       [0.0, 0.0, 0.0, 0.9, 0.9, 0.9]]], np.float32)
    out = np.asarray(pyramid_roi_align(boxes, meta, feats, 5))
    levels = np.asarray(
        compute_roi_levels(boxes, (64.0, 64.0, 16.0))
    )[0]
    for i in range(2):
        lv = int(levels[i])
        direct = np.asarray(
            crop_and_resize_3d(feats[lv], boxes[0, i:i + 1], np.array([0], np.int32),
                               (5, 5, 5))
        )
        np.testing.assert_allclose(out[0, i], direct[0], atol=1e-4)

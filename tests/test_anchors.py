"""Anchor generation tests (parity properties from reference call sites)."""

import numpy as np

from m3d import anchors as A
from m3d.config import Config


def small_config(**kw):
    base = dict(
        IMAGE_SIZE=64,
        IMAGE_DEPTH=16,
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1), (64, 64, 2)],
        RPN_ANCHOR_SCALES=(8, 16, 24, 32, 48),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        RPN_ANCHOR_STRIDE=1,
    )
    base.update(kw)
    return Config(**base)


def test_generate_anchors_layout():
    a = A.generate_anchors(10, [1.0], (4, 4, 2), (8, 8, 4), 1, max_depth=16)
    assert a.shape == (4 * 4 * 2, 6)
    # First anchor centered at origin
    np.testing.assert_allclose(a[0], [-5, -5, -5, 5, 5, 5])
    # Depth = scale * ratio clipped to [0.5, max_depth]
    a2 = A.generate_anchors(10, [0.01], (1, 1, 1), (8, 8, 4), 1, max_depth=16)
    assert (a2[0, 5] - a2[0, 2]) == 0.5


def test_distribute_scales():
    # n >= L: contiguous chunks, extras to lowest levels
    assert A.distribute_scales([5, 1, 3, 2, 4], 5) == [[1], [2], [3], [4], [5]]
    assert A.distribute_scales([1, 2, 3, 4, 5, 6], 5) == [[1, 2], [3], [4], [5], [6]]
    # n < L: repeat the last scale
    assert A.distribute_scales([1, 2], 4) == [[1], [2], [2], [2]]


def test_pyramid_anchor_count_matches_head_output():
    cfg = small_config()
    anchors = A.normalized_pyramid_anchors(cfg)
    shapes = cfg.backbone_shapes()
    apl = A.anchors_per_location(cfg.RPN_ANCHOR_SCALES, cfg.RPN_ANCHOR_RATIOS, 5)
    expected = sum(
        int(np.prod(shapes[lv])) * apl[lv] for lv in range(5)
    )
    assert anchors.shape == (expected, 6)


def test_normalized_anchor_bounds():
    cfg = small_config()
    a = A.normalized_pyramid_anchors(cfg)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert np.all(a[:, 3] > a[:, 0])
    assert np.all(a[:, 4] > a[:, 1])
    assert np.all(a[:, 5] > a[:, 2])


def test_anisotropy_scaling():
    cfg = small_config()
    iso = A.normalized_pyramid_anchors(cfg, voxel_z_over_y=1.0)
    aniso = A.normalized_pyramid_anchors(cfg, voxel_z_over_y=2.0)
    # z extents shrink when voxels are 2x taller in z
    z_iso = (iso[:, 5] - iso[:, 2]).mean()
    z_aniso = (aniso[:, 5] - aniso[:, 2]).mean()
    assert z_aniso < z_iso

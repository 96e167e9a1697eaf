"""Pallas ROIAlign kernel (interpret mode) vs the XLA path and oracle."""

import numpy as np
import pytest

from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.ops.roialign3d import (pyramid_roi_align, pyramid_roi_align_pallas,
                                slab_sizes)


def make_case(rng, c, depth, n=6):
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=depth, NUM_CLASSES=2)
    meta = default_meta(cfg)[None]
    feats = [rng.randn(1, 16, 16, depth, c).astype(np.float32),
             rng.randn(1, 8, 8, depth, c).astype(np.float32),
             rng.randn(1, 4, 4, max(depth // 2, 1), c).astype(np.float32),
             rng.randn(1, 2, 2, max(depth // 4, 1), c).astype(np.float32)]
    lo = rng.uniform(0, 0.45, (1, n, 3)).astype(np.float32)
    ext = rng.uniform(0.1, 0.5, (1, n, 3)).astype(np.float32)
    boxes = np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1)
    return boxes, meta, feats


@pytest.mark.parametrize("c,depth", [(8, 16), (256, 64), (128, 8)])
def test_pallas_matches_xla(rng, c, depth):
    """Small pyramids dispatch to the VMEM-resident kernel."""
    boxes, meta, feats = make_case(rng, c, depth)
    ref = np.asarray(pyramid_roi_align(boxes, meta, feats, 7))
    got = np.asarray(
        pyramid_roi_align_pallas(boxes, meta, feats, 7, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("c,depth", [(8, 16), (128, 8)])
def test_pallas_tiered_slab_matches_xla(rng, c, depth):
    """Forcing `slab` exercises the span-routed slab-DMA fallback kernel
    (the path big pyramids take), including its tier sort/combine/unsort."""
    boxes, meta, feats = make_case(rng, c, depth)
    ref = np.asarray(pyramid_roi_align(boxes, meta, feats, 7))
    got = np.asarray(pyramid_roi_align_pallas(
        boxes, meta, feats, 7, slab=(16, 16, max(depth, 16)),
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_slab_sizes_cover_levels(rng):
    _, _, feats = make_case(rng, 8, 64)
    sy, sx, sz = slab_sizes(feats)
    assert sy == 16 and sx == 16 and sz == 64


def test_deep_z_spans_are_exact(rng):
    """Boxes spanning most of a z-stride-1 (deep) feature column — the case
    a fixed 16-cell slab silently clamps."""
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=64, NUM_CLASSES=2)
    meta = default_meta(cfg)[None]
    c = 8
    feats = [rng.randn(1, 16, 16, 64, c).astype(np.float32),
             rng.randn(1, 8, 8, 64, c).astype(np.float32),
             rng.randn(1, 4, 4, 64, c).astype(np.float32),
             rng.randn(1, 2, 2, 64, c).astype(np.float32)]
    boxes = np.array([[[0.1, 0.1, 0.02, 0.4, 0.4, 0.95]]], np.float32)

    # Oracle: direct crop from the routed level.
    from m3d.ops.roialign3d import compute_roi_levels, crop_and_resize_3d

    lv = int(np.asarray(compute_roi_levels(boxes, (64.0, 64.0, 64.0)))[0, 0])
    direct = np.asarray(crop_and_resize_3d(
        feats[lv], boxes[0], np.array([0], np.int32), (7, 7, 7)))
    xla = np.asarray(pyramid_roi_align(boxes, meta, feats, 7))
    pls = np.asarray(
        pyramid_roi_align_pallas(boxes, meta, feats, 7, interpret=True))
    np.testing.assert_allclose(xla[0, 0], direct[0], atol=1e-4)
    np.testing.assert_allclose(pls[0, 0], direct[0], atol=1e-4)


@pytest.mark.slow  # 2048-ROI interpret-mode kernel run (~40 s)
def test_fused_fc_matches_unfused(rng):
    """pyramid_roi_align_fc (interpret) == gather path + conv3d_fc, with
    mixed fc-tier/fallback ROIs, boundary boxes, and odd N."""
    from m3d.ops.conv3d import conv3d_fc
    from m3d.ops.roialign3d import pyramid_roi_align_fc

    c, f = 256, 512
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=16, NUM_CLASSES=2)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    feats = [rng.randn(2, 16, 16, 16, c).astype(np.float32),
             rng.randn(2, 8, 8, 16, c).astype(np.float32),
             rng.randn(2, 4, 4, 8, c).astype(np.float32),
             rng.randn(2, 2, 2, 4, c).astype(np.float32)]
    lo = rng.uniform(-0.1, 0.6, (2, 13, 3)).astype(np.float32)
    ext = rng.uniform(0.0, 0.9, (2, 13, 3)).astype(np.float32)
    boxes = np.clip(np.concatenate([lo, lo + ext], -1), 0, 1)
    boxes[0, 3] = [0.3, 0.3, 0.3, 0.3, 0.3, 0.3]    # degenerate
    boxes[0, 5] = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]    # full image
    kern = (rng.randn(7, 7, 7, c, f) * 0.01).astype(np.float32)

    pooled = pyramid_roi_align(boxes, meta, feats, 7)
    ref = np.asarray(conv3d_fc(
        np.asarray(pooled).reshape(-1, 7, 7, 7, c), kern,
        preferred_element_type=np.float32)).reshape(2, 13, f)
    got = np.asarray(pyramid_roi_align_fc(
        boxes, meta, feats, 7, kern, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


@pytest.mark.parametrize("c,interp", [(256, True), (8, False)])
def test_compact_matches_padded(rng, c, interp):
    """pyramid_roi_align_compact (Pallas VMEM compact kernel in interpret
    mode at c=256; XLA gather fallback at c=8) == pyramid_roi_align on the
    equivalent padded layout, with skewed per-image counts; rows at or
    beyond `total` are exactly zero."""
    import numpy as np

    from m3d.ops.roialign3d import pyramid_roi_align_compact

    depth = 16
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=depth, NUM_CLASSES=2)
    meta = np.tile(default_meta(cfg)[None], (3, 1))
    feats = [rng.randn(3, 16, 16, depth, c).astype(np.float32),
             rng.randn(3, 8, 8, depth, c).astype(np.float32),
             rng.randn(3, 4, 4, depth // 2, c).astype(np.float32),
             rng.randn(3, 2, 2, depth // 4, c).astype(np.float32)]
    n_per = 4
    lo = rng.uniform(0, 0.45, (3, n_per, 3)).astype(np.float32)
    ext = rng.uniform(0.1, 0.5, (3, n_per, 3)).astype(np.float32)
    boxes = np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1)

    # Skewed live counts [3, 0, 2]: compacted list = image0 rows 0..2,
    # image2 rows 0..1, then padding rows (zero boxes, arbitrary indices).
    counts = [3, 0, 2]
    total = sum(counts)
    boxes_f = np.zeros((3 * n_per, 6), np.float32)
    batch_f = np.zeros((3 * n_per,), np.int32)
    r = 0
    for b, cnt in enumerate(counts):
        boxes_f[r:r + cnt] = boxes[b, :cnt]
        batch_f[r:r + cnt] = b
        r += cnt

    ref = np.asarray(pyramid_roi_align(boxes, meta, feats, 7))
    got = np.asarray(pyramid_roi_align_compact(
        boxes_f, batch_f, np.int32(total), meta, feats, 7,
        interpret=interp))
    r = 0
    for b, cnt in enumerate(counts):
        np.testing.assert_allclose(got[r:r + cnt], ref[b, :cnt], atol=1e-4)
        r += cnt
    assert (got[total:] == 0).all()


def test_portable_lowering_forces_gather(rng):
    """Inside roialign3d.portable_lowering() the compact entry must take the
    XLA gather fallback even where the Pallas kernel would dispatch
    (interpret=True stands in for a TPU backend) — multi-platform serving
    exports depend on this (m3d/serve.py). The fallback output must match
    the gather path exactly and the flag must restore on exit."""
    import numpy as np

    import m3d.ops.roialign3d as ra

    depth = 16
    c = 256
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=depth, NUM_CLASSES=2)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    feats = [rng.randn(2, 16, 16, depth, c).astype(np.float32),
             rng.randn(2, 8, 8, depth, c).astype(np.float32),
             rng.randn(2, 4, 4, depth // 2, c).astype(np.float32),
             rng.randn(2, 2, 2, depth // 4, c).astype(np.float32)]
    lo = rng.uniform(0, 0.45, (6, 3)).astype(np.float32)
    ext = rng.uniform(0.1, 0.5, (6, 3)).astype(np.float32)
    boxes_f = np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1)
    batch_f = np.asarray([0, 0, 0, 1, 1, 1], np.int32)

    gather = np.asarray(
        ra.pyramid_roi_align_flat(boxes_f, batch_f, meta, feats, 7))
    with ra.portable_lowering():
        assert ra._PORTABLE_ONLY
        got = np.asarray(ra.pyramid_roi_align_compact(
            boxes_f, batch_f, np.int32(6), meta, feats, 7, interpret=True))
    assert not ra._PORTABLE_ONLY
    # Bit-exact: same formulation, not just numerically close.
    np.testing.assert_array_equal(got, gather)


@pytest.mark.slow  # interpret-mode kernel run
def test_fused_fc_kron_matches_unfused(rng):
    """pyramid_roi_align_fc(kernel="kron") (interpret) == gather path +
    conv3d_fc — the Kronecker y+x formulation dispatched on TPU by
    MaskRCNN.classify_rois (r5; 26.8 vs 36.5 ms on-chip)."""
    from m3d.ops.conv3d import conv3d_fc
    from m3d.ops.roialign3d import pyramid_roi_align_fc

    c, f = 256, 512
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=16, NUM_CLASSES=2)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    feats = [rng.randn(2, 16, 16, 16, c).astype(np.float32),
             rng.randn(2, 8, 8, 16, c).astype(np.float32),
             rng.randn(2, 4, 4, 8, c).astype(np.float32),
             rng.randn(2, 2, 2, 4, c).astype(np.float32)]
    lo = rng.uniform(-0.1, 0.6, (2, 7, 3)).astype(np.float32)
    ext = rng.uniform(0.0, 0.9, (2, 7, 3)).astype(np.float32)
    boxes = np.clip(np.concatenate([lo, lo + ext], -1), 0, 1)
    boxes[0, 3] = [0.3, 0.3, 0.3, 0.3, 0.3, 0.3]    # degenerate
    kern = (rng.randn(7, 7, 7, c, f) * 0.01).astype(np.float32)

    pooled = pyramid_roi_align(boxes, meta, feats, 7)
    ref = np.asarray(conv3d_fc(
        np.asarray(pooled).reshape(-1, 7, 7, 7, c), kern,
        preferred_element_type=np.float32)).reshape(2, 7, f)
    got = np.asarray(pyramid_roi_align_fc(
        boxes, meta, feats, 7, kern, interpret=True, kernel="kron"))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


@pytest.mark.slow
def test_fused_fc_flat_kron_matches_gather(rng):
    """pyramid_roi_align_fc_flat (kron, interpret) over a flat ROI list ==
    pyramid_roi_align_flat + conv3d_fc, mixed source images."""
    from m3d.ops.conv3d import conv3d_fc
    from m3d.ops.roialign3d import (pyramid_roi_align_fc_flat,
                                    pyramid_roi_align_flat)

    c, f = 256, 512
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=16, NUM_CLASSES=2)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    feats = [rng.randn(2, 16, 16, 16, c).astype(np.float32),
             rng.randn(2, 8, 8, 16, c).astype(np.float32),
             rng.randn(2, 4, 4, 8, c).astype(np.float32),
             rng.randn(2, 2, 2, 4, c).astype(np.float32)]
    n = 9
    lo = rng.uniform(0.0, 0.6, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.5, (n, 3)).astype(np.float32)
    boxes = np.clip(np.concatenate([lo, lo + ext], -1), 0, 1)
    bidx = (np.arange(n) % 2).astype(np.int32)
    kern = (rng.randn(7, 7, 7, c, f) * 0.01).astype(np.float32)

    pooled = pyramid_roi_align_flat(boxes, bidx, meta, feats, 7)
    ref = np.asarray(conv3d_fc(
        np.asarray(pooled), kern,
        preferred_element_type=np.float32)).reshape(n, f)
    got = np.asarray(pyramid_roi_align_fc_flat(
        boxes, bidx, meta, feats, 7, kern, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)

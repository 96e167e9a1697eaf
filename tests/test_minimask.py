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


def test_detection_targets_mini_matches_full(rng):
    """use_mini_mask crops from GT-relative coordinates and agrees with the
    full-resolution path (reference core/models.py:975-993)."""
    import jax
    import jax.numpy as jnp

    from m3d.models.detection_targets import detection_targets

    shape = (48, 48, 24)
    boxes_px, masks = _volume_with_boxes(rng, shape=shape, n=3)
    scale = np.array([shape[0], shape[1], shape[2]] * 2, np.float32)
    gt_boxes = (boxes_px / scale).astype(np.float32)
    gt_class_ids = np.ones(3, np.int32)
    mini = minimize_mask(boxes_px, masks, (28, 28, 28))

    # proposals: the GT boxes plus slight jitter -> guaranteed positives
    props = np.concatenate(
        [gt_boxes, np.clip(gt_boxes + rng.uniform(-0.02, 0.02, (3, 6)), 0, 1)]
    ).astype(np.float32)
    key = jax.random.PRNGKey(0)
    kw = dict(
        bbox_std_dev=jnp.ones(6, jnp.float32),
        train_rois_per_image=8, roi_positive_ratio=0.5,
        positive_iou_threshold=0.5, negative_iou_threshold=0.3,
        mask_shape=(14, 14, 14),
    )
    full = detection_targets(
        key, jnp.asarray(props), jnp.asarray(gt_class_ids),
        jnp.asarray(gt_boxes), jnp.asarray(masks, jnp.float32), **kw)
    minir = detection_targets(
        key, jnp.asarray(props), jnp.asarray(gt_class_ids),
        jnp.asarray(gt_boxes), jnp.asarray(mini, jnp.float32),
        use_mini_mask=True, **kw)

    # Same key -> identical sampling; masks agree up to the mini resize.
    np.testing.assert_allclose(full["rois"], minir["rois"], atol=1e-6)
    n_pos = int(full["pos_count"])
    assert n_pos >= 2
    for i in range(n_pos):
        a = np.asarray(full["masks"][i]) > 0.5
        b = np.asarray(minir["masks"][i]) > 0.5
        dice = 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)
        assert dice > 0.80, (i, dice)


def test_generator_emits_mini_masks(tmp_path, rng):
    """USE_MINI_MASK in config makes _sample_gt store MINI_MASK_SHAPE masks."""
    from m3d.config import Config
    from m3d.data import synthetic
    from m3d.data.datasets import ToyDataset
    from m3d.data.generators import MrcnnGenerator

    root = str(tmp_path / "ds")
    synthetic.generate_experiment(2, 32, root, seed=0, image_depth=16)
    synthetic.split_dataset(root, test_ratio=0.5)
    ds = ToyDataset()
    ds.load_dataset(root, is_train=True)
    ds.prepare()

    cfg = Config(IMAGE_SIZE=32, IMAGE_DEPTH=16, MAX_GT_INSTANCES=8,
                 USE_MINI_MASK=True, MINI_MASK_SHAPE=(14, 14, 14),
                 IMAGES_PER_GPU=1, GPU_COUNT=1, NUM_CLASSES=2)
    gen = MrcnnGenerator(ds, cfg, mode="targeting", shuffle=False)
    s = gen._sample_gt(0)
    assert s["gt_masks"].shape[:3] == (14, 14, 14)
    assert s["gt_masks"].shape[3] == 8
    assert s["gt_masks"].sum() > 0

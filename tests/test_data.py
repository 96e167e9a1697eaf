"""Data layer: synthetic generator, datasets, RPN targets, augs, generators."""

import numpy as np
import pytest

from m3d.config import Config
from m3d.data import synthetic
from m3d.data.augment import apply_minimal_augs_3d, jitter_boxes_3d
from m3d.data.datasets import ToyDataset, normalize_volume
from m3d.data.generators import MrcnnGenerator, RPNGenerator, pad_to
from m3d.data.rpn_targets import build_rpn_targets, overlaps_3d_numpy


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("toy"))
    synthetic.generate_experiment(4, 48, d, seed=1, image_depth=16)
    synthetic.split_dataset(d, test_ratio=0.25)
    return d


def small_config(**kw):
    base = dict(
        IMAGE_SIZE=48, IMAGE_DEPTH=16, NUM_CLASSES=2, MAX_GT_INSTANCES=24,
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 2),
                          (48, 48, 4)],
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        RPN_TRAIN_ANCHORS_PER_IMAGE=128,
        RPN_POSITIVE_IOU=0.5, RPN_NEGATIVE_IOU=0.2,
        IMAGES_PER_GPU=2, GPU_COUNT=1,
        AUGMENT=False,
    )
    base.update(kw)
    return Config(**base)


def test_synthetic_generator_roundtrip(toy_dir):
    ds = ToyDataset()
    ds.load_dataset(toy_dir, is_train=True)
    ds.prepare()
    assert ds.num_images == 3
    img = ds.load_image(0)
    assert img.ndim == 4 and img.shape[-1] == 1
    assert -1.0 <= img.min() and img.max() <= 1.0
    boxes, class_ids, masks = ds.load_data(0)
    assert boxes.shape[0] == class_ids.shape[0] == masks.shape[-1]
    assert boxes.shape[0] >= 3
    # Boxes bound their masks (after loader's consistent permutation)
    for i in range(boxes.shape[0]):
        ys, xs, zs = np.where(masks[..., i] > 0)
        np.testing.assert_array_equal(
            boxes[i], [ys.min(), xs.min(), zs.min(),
                       ys.max() + 1, xs.max() + 1, zs.max() + 1]
        )


def test_normalize_volume_range(rng):
    vol = rng.uniform(0, 255, (8, 8, 8)).astype(np.float32)
    out = normalize_volume(vol)
    assert out.shape == (8, 8, 8, 1)
    assert -1 <= out.min() and out.max() <= 1


def test_build_rpn_targets_properties(toy_dir):
    from m3d.anchors import normalized_pyramid_anchors

    cfg = small_config()
    anchors = normalized_pyramid_anchors(cfg)
    ds = ToyDataset()
    ds.load_dataset(toy_dir, is_train=True)
    ds.prepare()
    boxes, class_ids, _ = ds.load_data(0)

    match, bbox = build_rpn_targets(anchors, class_ids, boxes.astype(np.float32),
                                    cfg, rng=np.random.RandomState(0))
    assert match.shape == (anchors.shape[0],)
    assert bbox.shape == (cfg.RPN_TRAIN_ANCHORS_PER_IMAGE, 6)
    n_pos = int((match == 1).sum())
    n_neg = int((match == -1).sum())
    # every GT gets at least ATSS_MIN_POS_PER_GT positives
    assert n_pos >= min(len(boxes) * int(cfg.ATSS_MIN_POS_PER_GT),
                        int(cfg.RPN_TRAIN_ANCHORS_PER_IMAGE // 2))
    assert n_pos + n_neg <= cfg.RPN_TRAIN_ANCHORS_PER_IMAGE
    # decoded deltas reconstruct GT: check the first positive
    pos = np.where(match == 1)[0][0]
    from m3d import boxes as B

    scale = np.array([48, 48, 16, 48, 48, 16], np.float32)
    deltas = bbox[0] * cfg.RPN_BBOX_STD_DEV
    rec = np.asarray(B.apply_deltas(anchors[pos], deltas))
    ious = overlaps_3d_numpy(rec[None] * scale, boxes.astype(np.float32))
    assert ious.max() > 0.9


def test_empty_gt_all_negative(toy_dir):
    cfg = small_config()
    from m3d.anchors import normalized_pyramid_anchors

    anchors = normalized_pyramid_anchors(cfg)
    match, bbox = build_rpn_targets(anchors, np.zeros(0, np.int32),
                                    np.zeros((0, 6), np.float32), cfg)
    assert (match == -1).all()
    assert (bbox == 0).all()


def test_flip_augmentation_consistency(rng):
    cfg = small_config(AUG_PROB=1.0, AUG_FLIP_Y=True, AUG_FLIP_X=True,
                       AUG_FLIP_Z=True, AUG_BRIGHTNESS_DELTA=0.0)
    img = rng.rand(16, 16, 8, 1).astype(np.float32)
    masks = np.zeros((16, 16, 8, 1), np.float32)
    masks[2:6, 3:9, 1:4, 0] = 1
    boxes = np.array([[2, 3, 1, 6, 9, 4]], np.float32)
    img2, boxes2, masks2 = apply_minimal_augs_3d(
        img, boxes, masks, cfg, rng=np.random.RandomState(0)
    )
    # boxes must still bound the flipped mask
    ys, xs, zs = np.where(masks2[..., 0] > 0)
    np.testing.assert_allclose(
        boxes2[0], [ys.min(), xs.min(), zs.min(),
                    ys.max() + 1, xs.max() + 1, zs.max() + 1]
    )


def test_jitter_boxes(rng):
    boxes = np.array([[10, 10, 4, 20, 22, 9]], np.float32)
    out = jitter_boxes_3d(boxes, count=5, img_shape=(48, 48, 16),
                          rng=np.random.RandomState(0))
    assert out.shape[0] >= 1
    np.testing.assert_array_equal(out[0], boxes[0])
    # jitters overlap the original
    ious = overlaps_3d_numpy(boxes, out[1:])
    if out.shape[0] > 1:
        assert (ious >= 0.4 - 1e-6).all()


def test_rpn_generator_batches(toy_dir):
    cfg = small_config()
    ds = ToyDataset()
    ds.load_dataset(toy_dir, is_train=True)
    ds.prepare()
    gen = RPNGenerator(ds, cfg, mode="training", seed=0)
    batch = next(iter(gen))
    assert batch["image"].shape == (2, 48, 48, 16, 1)
    assert batch["rpn_match"].shape == (2, gen.anchors.shape[0])
    assert batch["rpn_bbox"].shape == (2, 128, 6)


def test_targeting_generator(toy_dir):
    cfg = small_config(MODE="targeting")
    ds = ToyDataset()
    ds.load_dataset(toy_dir, is_train=True)
    ds.prepare()
    gen = RPNGenerator(ds, cfg, mode="targeting", seed=0)
    batch = next(iter(gen))
    assert batch["image"].shape[0] == 1
    assert batch["gt_boxes"].shape == (1, 24, 6)
    assert batch["gt_boxes"].max() <= 1.0
    assert batch["gt_masks"].shape[:4] == (1, 48, 48, 16)
    assert batch["image_meta"].shape == (1, cfg.IMAGE_META_SIZE)


def test_mrcnn_generator_training(toy_dir):
    cfg = small_config()
    ds = ToyDataset()
    ds.load_dataset(toy_dir, is_train=True)
    ds.prepare()
    gen = MrcnnGenerator(ds, cfg, mode="training", seed=0)
    batch = next(iter(gen))
    for key in ("image", "image_meta", "gt_class_ids", "gt_boxes", "gt_masks",
                "rpn_match", "rpn_bbox"):
        assert key in batch
    assert batch["rpn_match"].shape == (2, gen.anchors.shape[0])


def test_pad_to():
    a = np.ones((3, 6))
    assert pad_to(a, 5).shape == (5, 6)
    assert pad_to(a, 2).shape == (2, 6)
    assert pad_to(a, 3) is a or (pad_to(a, 3) == a).all()


def test_synthetic_anisotropic_objects():
    """voxel_z_over_y > 1 generates the rats/HeLa acquisition regime:
    objects sized by XY and z-squashed by the factor (object z extents must
    be several times smaller than xy extents on average)."""
    import numpy as np

    from m3d.data import synthetic

    rng = np.random.RandomState(0)
    img, seg, masks, boxes, cls = synthetic.create_volume(
        (96, 96, 12), rng, voxel_z_over_y=4.0)
    assert boxes.shape[0] >= 3
    xy = ((boxes[:, 3] - boxes[:, 0]) + (boxes[:, 4] - boxes[:, 1])) / 2.0
    z = boxes[:, 5] - boxes[:, 2]
    assert (z <= 12).all()
    # mean anisotropy near the squash factor (rotation adds variance)
    assert xy.mean() / z.mean() > 2.0, (xy.mean(), z.mean())
    # isotropic control: extents comparable
    img2, _, _, boxes2, _ = synthetic.create_volume((96, 96, 96),
                                                    np.random.RandomState(1))
    xy2 = ((boxes2[:, 3] - boxes2[:, 0]) + (boxes2[:, 4] - boxes2[:, 1])) / 2.0
    z2 = boxes2[:, 5] - boxes2[:, 2]
    assert 0.5 < xy2.mean() / z2.mean() < 2.0

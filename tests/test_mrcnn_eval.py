"""MRCNN_EVALUATION end-to-end smoke: inference + metrics + artifacts
(TIFF label volume, boxes CSV, overlay PNG, summary with confidence
histogram) on tiny synthetic data with randomly-initialized weights —
the artifact/metric contract of the reference's evaluate loop
(core/models.py:6338-7196)."""

import os

import numpy as np
import pytest

from m3d.data import synthetic

from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # multi-minute compiles/train loops


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("eval_data"))
    synthetic.generate_experiment(2, 64, d, seed=11, image_depth=8)
    synthetic.split_dataset(d, test_ratio=0.5)
    return d


def test_evaluate_writes_artifacts_and_summary(data_dir):
    from m3d.train.mrcnn import MrcnnTrainer

    cfg = tiny_train_config(
        data_dir,
        MODE="inference",
        DETECTION_MIN_CONFIDENCE=0.0,
        DETECTION_NMS_THRESHOLD=0.9,
        DETECTION_MAX_INSTANCES=8,
        MIN_ROI_SIZE=0,
        OUTPUT_DIR=os.path.join(data_dir, "eval_out"),
    )
    trainer = MrcnnTrainer(cfg)
    summary, per_image = trainer.evaluate(max_images=1)

    assert per_image, "no image evaluated"
    res = per_image[0]
    for key in ("pixel_f1", "pixel_iou", "instance_dice", "det_tp",
                "det_fp", "det_fn", "n_gt"):
        assert key in res
    assert res["n_gt"] > 0

    for key in ("pixel_f1", "det_precision", "det_recall"):
        assert key in summary
    if res["scores"]:
        assert "confidence_hist" in summary
        assert 0.0 <= summary["recommended_confidence"] <= 1.0

    out = cfg.OUTPUT_DIR
    name = "000000"
    assert os.path.exists(os.path.join(out, f"{name}.csv"))
    assert os.path.exists(os.path.join(out, f"{name}.tiff"))
    # Label volume round-trips and has only small non-negative labels.
    from m3d.utils.tiffio import imread_volume

    vol = imread_volume(os.path.join(out, f"{name}.tiff"))
    assert vol.shape == (8, 64, 64)  # (Z, Y, X) pages
    assert vol.min() >= 0
    overlay = os.path.join(out, "overlays", f"{name}_masks_overlay.png")
    assert os.path.exists(overlay)


def test_evaluate_nms_stage_removes_duplicates(data_dir):
    """The reference's final numpy-NMS stage (core/models.py:6911-6991):
    two near-identical detections that both survive confidence+volume must
    collapse to ONE in the evaluation cascade, even though the in-graph
    DETECTION_NMS_THRESHOLD was too loose to remove them."""
    from m3d.train.mrcnn import MrcnnTrainer
    from m3d.data.datasets import ToyDataset

    cfg = tiny_train_config(
        data_dir,
        MODE="inference",
        DETECTION_MIN_CONFIDENCE=0.1,
        DETECTION_NMS_THRESHOLD=0.4,
        DETECTION_MAX_INSTANCES=8,
        MIN_ROI_SIZE=0,
        OUTPUT_DIR=os.path.join(data_dir, "eval_nms_out"),
    )
    trainer = MrcnnTrainer(cfg)

    ds = ToyDataset()
    ds.load_dataset(data_dir, is_train=False,
                    class_names=tuple(cfg.CLASS_NAMES))
    ds.prepare()

    # Two overlapping boxes (IoU ~0.9) + padding rows.
    det = np.zeros((8, 8), np.float32)
    det[0] = [0.2, 0.2, 0.1, 0.6, 0.6, 0.9, 1, 0.95]
    det[1] = [0.21, 0.21, 0.1, 0.61, 0.61, 0.9, 1, 0.80]
    masks = np.zeros((8, 14, 14, 14, cfg.NUM_CLASSES), np.float32)
    masks[:2, 3:11, 3:11, 3:11, 1] = 0.99
    out = {"detections": det[None], "mrcnn_masks": masks[None]}

    res = trainer._evaluate_one(ds, 0, out, cfg.OUTPUT_DIR, None,
                                write_artifacts=False)
    assert res["n_detections"] == 1, (
        "duplicate detection survived the evaluate-loop NMS stage"
    )


def test_variable_image_size_bucketing(tmp_path):
    """A 48x48x12 volume (not the config's 64x64x8) must evaluate through
    the bucket path: zero-pad to 64x64x16, per-bucket anchors from the
    cache, unmold at the bucket shape, crop back to the true window."""
    from m3d.data.generators import MrcnnGenerator
    from m3d.data.datasets import ToyDataset
    from m3d.train.mrcnn import MrcnnTrainer
    from m3d.anchors import bucket_image_shape

    assert bucket_image_shape((48, 48, 12)) == (64, 64, 16)
    assert bucket_image_shape((64, 64, 8)) == (64, 64, 8)
    assert bucket_image_shape((65, 130, 17)) == (128, 192, 24)

    d = str(tmp_path / "var")
    synthetic.generate_experiment(2, 48, d, seed=21, image_depth=12)
    synthetic.split_dataset(d, test_ratio=0.5)

    cfg = tiny_train_config(
        d, MODE="inference", IMAGE_SIZE=64, IMAGE_DEPTH=16,
        DETECTION_MIN_CONFIDENCE=0.0, MIN_ROI_SIZE=0,
        OUTPUT_DIR=os.path.join(d, "eval_out"),
    )
    ds = ToyDataset()
    ds.load_dataset(d, is_train=False, class_names=tuple(cfg.CLASS_NAMES))
    ds.prepare()
    gen = MrcnnGenerator(ds, cfg, mode="inference", shuffle=False)
    inputs = gen.get_input_prediction(0)
    assert inputs["image"].shape == (1, 64, 64, 16, 1)
    meta = inputs["image_meta"][0]
    assert tuple(int(v) for v in meta[1:4]) == (48, 48, 12)   # original
    assert tuple(int(v) for v in meta[5:8]) == (64, 64, 16)   # padded
    # Padding region is exactly zero.
    assert float(np.abs(inputs["image"][0, 48:]).max()) == 0.0

    trainer = MrcnnTrainer(cfg)
    summary, per_image = trainer.evaluate(max_images=1)
    assert per_image, "variable-size image failed to evaluate"
    # Metrics computed at the ORIGINAL 48x48x12 extent.
    res = per_image[0]
    assert res["n_gt"] > 0

"""End-to-end smoke: RPN training steps + target generation on tiny synthetic
data (CPU). This is the framework's equivalent of the reference's
synthetic-volume integration test (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from m3d.config import Config
from m3d.data import synthetic

pytestmark = pytest.mark.slow  # multi-minute compiles/train loops


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rpn_data"))
    synthetic.generate_experiment(4, 64, d, seed=3, image_depth=8)
    synthetic.split_dataset(d, test_ratio=0.25)
    return d


def tiny_train_config(data_dir, **kw):
    base = dict(
        DATA_DIR=data_dir,
        OUTPUT_DIR=os.path.join(data_dir, "out"),
        WEIGHT_DIR=os.path.join(data_dir, "weights"),
        IMAGE_SIZE=64, IMAGE_DEPTH=8, NUM_CLASSES=2, MAX_GT_INSTANCES=24,
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                          (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        RPN_TRAIN_ANCHORS_PER_IMAGE=64,
        RPN_POSITIVE_IOU=0.4, RPN_NEGATIVE_IOU=0.2,
        PRE_NMS_LIMIT=256, POST_NMS_ROIS_TRAINING=64,
        POST_NMS_ROIS_INFERENCE=64,
        TRAIN_ROIS_PER_IMAGE=16, ROI_POSITIVE_RATIO=0.33,
        POOL_SIZE=7, MASK_POOL_SIZE=14, MASK_SHAPE=[28, 28, 28],
        FPN_CLASSIF_FC_LAYERS_SIZE=32, HEAD_CONV_CHANNEL=16,
        TOP_DOWN_PYRAMID_SIZE=16,
        EPOCHS=1, IMAGES_PER_GPU=1, GPU_COUNT=1,
        OPTIMIZER={"name": "SGD", "parameters": {"learning_rate": 0.01,
                                                 "momentum": 0.9}},
        AUGMENT=False, RPN_AUGMENT_GT=False,
        MIN_POSITIVE_TARGETS=1,
        COMPUTE_DTYPE="float32",
        TELEMETRY_SAMPLE=1.0,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def trained(data_dir):
    from m3d.train.rpn import RPNTrainer

    cfg = tiny_train_config(data_dir)
    trainer = RPNTrainer(cfg)
    variables, history = trainer.train(steps_per_epoch=2, eval_images=1)
    return cfg, trainer, variables, history


def test_rpn_training_runs_and_logs(trained):
    cfg, trainer, variables, history = trained
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert "detection_score" in history[0]
    # checkpoints written
    assert os.path.exists(os.path.join(cfg.WEIGHT_DIR, "latest.msgpack"))
    assert os.path.exists(os.path.join(cfg.WEIGHT_DIR, "best.msgpack"))
    # telemetry JSONL with the reference record shape
    import json

    with open(os.path.join(cfg.WEIGHT_DIR, "telemetry.jsonl")) as f:
        rec = json.loads(f.readline())
    for key in ("epoch", "cnt", "hist", "top", "suggest"):
        assert key in rec


def test_target_generation_artifacts(trained, data_dir):
    cfg, trainer, variables, history = trained
    out_root, manifests = trainer.head_target_generation(
        variables, max_images=2, inject_gt=True
    )
    import pandas as pd

    td = pd.read_csv(manifests["train"])
    assert len(td) >= 1
    row = td.iloc[0]
    # rois fp32, aligned features fp16, masks bit-packed (reference:
    # core/models.py:3585-3636)
    with np.load(row["rois_aligned"]) as z:
        assert z["arr"].dtype == np.float16
        assert z["arr"].shape == (cfg.TRAIN_ROIS_PER_IMAGE, 7, 7, 7, 16)
    with np.load(row["target_mask"]) as z:
        assert z["mask"].dtype == np.uint8  # packed bits
        assert tuple(z["shape"]) == (cfg.TRAIN_ROIS_PER_IMAGE, 28, 28, 28)

    # Round-trip through ToyHeadDataset
    from m3d.data.datasets import ToyHeadDataset

    ds = ToyHeadDataset()
    ds.load_dataset(out_root, is_train=True)
    ds.prepare()
    data = ds.load_data(0)
    assert data["rois_aligned"].shape[1:] == (7, 7, 7, 16)
    assert data["target_mask"].shape == (cfg.TRAIN_ROIS_PER_IMAGE, 28, 28, 28)
    assert set(np.unique(data["target_mask"])).issubset({0.0, 1.0})

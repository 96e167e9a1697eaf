"""HEAD training smoke tests: head-only (pre-generated targets) and e2e."""

import os

import numpy as np
import pytest

from m3d.config import Config
from m3d.data import synthetic
from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # multi-minute compiles/train loops


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Synthetic data -> 1-epoch RPN -> targets; shared by the head tests."""
    d = str(tmp_path_factory.mktemp("head_data"))
    synthetic.generate_experiment(4, 64, d, seed=11, image_depth=8)
    synthetic.split_dataset(d, test_ratio=0.25)

    from m3d.train.rpn import RPNTrainer

    cfg = tiny_train_config(d)
    trainer = RPNTrainer(cfg)
    variables, _ = trainer.train(steps_per_epoch=2, eval_images=1)
    # inject_gt guarantees positive targets with this barely-trained RPN
    # (the pipeline under test is targeting->head training, not RPN quality).
    out_root, manifests = trainer.head_target_generation(variables,
                                                         max_images=3,
                                                         inject_gt=True)
    return d, cfg, out_root


def test_head_only_training(pipeline):
    d, base_cfg, out_root = pipeline
    from m3d.train.head import HeadTrainer

    cfg = tiny_train_config(
        d, DATA_DIR=out_root, MODE="training",
        WEIGHT_DIR=os.path.join(d, "head_weights"),
        TRAIN_ROIS_PER_IMAGE=16,
    )
    trainer = HeadTrainer(cfg)
    variables, history = trainer.train_head_only(steps_per_epoch=2,
                                                 val_steps=1)
    assert len(history) == 1
    m = history[0]
    assert np.isfinite(m["loss"])
    assert "mask_dice" in m and "class_pos_acc" in m
    assert os.path.exists(os.path.join(cfg.WEIGHT_DIR, "best_head.msgpack"))


def test_e2e_training_with_frozen_rpn(pipeline):
    d, base_cfg, out_root = pipeline
    from m3d.train.head import HeadTrainer
    from m3d.train.checkpoints import load_params

    rpn_best = os.path.join(base_cfg.WEIGHT_DIR, "best.msgpack")
    cfg = tiny_train_config(
        d, MODE="training_head_e2e", RPN_WEIGHTS=rpn_best,
        WEIGHT_DIR=os.path.join(d, "e2e_weights"),
    )
    trainer = HeadTrainer(cfg)
    variables, history = trainer.train_e2e(steps_per_epoch=2, val_steps=1)
    assert np.isfinite(history[0]["loss"])

    # e2e validates on the held-out test split and gates best.msgpack on
    # val loss (reference core/models.py:4609-4622, 2035-2049).
    assert "val_loss" in history[0] and np.isfinite(history[0]["val_loss"])
    import json

    with open(os.path.join(cfg.WEIGHT_DIR, "best.msgpack.json")) as f:
        meta = json.load(f)
    best_epoch = min(range(len(history)),
                     key=lambda e: history[e]["val_loss"])
    assert meta["metric"] == pytest.approx(
        history[best_epoch]["val_loss"], rel=1e-6)

    # Frozen subtrees must be bit-identical to the restored RPN weights.
    source, _ = load_params(rpn_best)
    import jax

    src_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(
            source["params"])[0]
    }
    out_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]
    }
    checked = 0
    for key, val in out_flat.items():
        if "resnet" in key or "fpn" in key or key.startswith("rpn"):
            if key in src_flat and src_flat[key].shape == val.shape:
                np.testing.assert_array_equal(val, src_flat[key])
                checked += 1
    assert checked > 50  # backbone/FPN/RPN params stayed frozen


def test_e2e_requires_rpn_weights(pipeline):
    d, base_cfg, out_root = pipeline
    from m3d.train.head import HeadTrainer

    cfg = tiny_train_config(d, MODE="training_head_e2e")
    trainer = HeadTrainer(cfg)
    with pytest.raises(ValueError, match="RPN_WEIGHTS"):
        trainer.init_variables(require_rpn=True)

"""MRCNN joint training smoke: LEARNING_LAYERS freeze selection, TRAIN_BN
stat updates, loss plumbing (reference MaskRCNN.train,
core/models.py:5808-5873)."""

import os

import numpy as np
import pytest

from m3d.data import synthetic
from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # multi-minute compiles/train loops


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mrcnn_data"))
    synthetic.generate_experiment(6, 64, d, seed=5, image_depth=8)
    synthetic.split_dataset(d, test_ratio=0.25)
    return d


def _flatten(tree):
    from flax import traverse_util

    return traverse_util.flatten_dict(tree, sep="/")


@pytest.mark.parametrize("learning_layers", ["all", "head", "rpn"])
def test_mrcnn_training_freeze_selection(data_dir, learning_layers):
    """2 steps of joint training per LEARNING_LAYERS mode: loss finite, the
    frozen subtree bit-identical, the trainable subtree actually moved."""
    from m3d.train.mrcnn import MrcnnTrainer

    cfg = tiny_train_config(
        data_dir, LEARNING_LAYERS=learning_layers, EPOCHS=1,
        WEIGHT_DIR=os.path.join(data_dir, f"w_{learning_layers}"),
        OUTPUT_DIR=os.path.join(data_dir, f"o_{learning_layers}"),
    )
    trainer = MrcnnTrainer(cfg)
    model = trainer._model("training")
    before = _flatten(trainer.init_variables(model)["params"])

    variables, history = trainer.train(steps_per_epoch=2)
    after = _flatten(variables["params"])

    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])

    def is_head(path):
        return any(seg.startswith("mrcnn_") for seg in path.split("/"))

    moved_head = any(
        not np.array_equal(np.asarray(before[k]), np.asarray(after[k]))
        for k in before if is_head(k)
    )
    moved_trunk = any(
        not np.array_equal(np.asarray(before[k]), np.asarray(after[k]))
        for k in before if not is_head(k)
    )
    if learning_layers == "all":
        assert moved_head and moved_trunk
    elif learning_layers == "head":
        assert moved_head and not moved_trunk
    else:  # rpn: trunk trains, heads frozen
        assert moved_trunk and not moved_head


def test_mrcnn_val_gated_checkpoint(data_dir):
    """The 80/20 val split is actually consumed: history carries val_*
    metrics and best.msgpack is gated on val loss, not train loss
    (reference fits with validation_data and gates best.h5 on val metrics,
    core/models.py:5808-5873, 2035-2049)."""
    import json

    from m3d.train.mrcnn import MrcnnTrainer

    cfg = tiny_train_config(
        data_dir, LEARNING_LAYERS="all", EPOCHS=2,
        WEIGHT_DIR=os.path.join(data_dir, "w_valgate"),
        OUTPUT_DIR=os.path.join(data_dir, "o_valgate"),
    )
    trainer = MrcnnTrainer(cfg)
    variables, history = trainer.train(steps_per_epoch=1, val_steps=1)

    assert all("val_loss" in m and np.isfinite(m["val_loss"])
               for m in history)
    with open(os.path.join(cfg.WEIGHT_DIR, "best.msgpack.json")) as f:
        meta = json.load(f)
    best_epoch = min(range(len(history)),
                     key=lambda e: history[e]["val_loss"])
    assert meta["metric"] == pytest.approx(
        history[best_epoch]["val_loss"], rel=1e-6)
    assert meta["epoch"] == best_epoch


def test_train_bn_updates_batch_stats(data_dir):
    """TRAIN_BN=true must actually update BN running stats during RPN
    training (mutable batch_stats threading; was latently broken: flax
    never got mutable=['batch_stats'])."""
    from m3d.train.rpn import RPNTrainer

    cfg = tiny_train_config(
        data_dir, TRAIN_BN=True, EPOCHS=1,
        WEIGHT_DIR=os.path.join(data_dir, "w_bn"),
        OUTPUT_DIR=os.path.join(data_dir, "o_bn"),
    )
    trainer = RPNTrainer(cfg)
    before = _flatten(trainer.init_variables().get("batch_stats", {}))
    assert before, "model should carry BN running stats"
    variables, _ = trainer.train(steps_per_epoch=2, eval_images=1)
    after = _flatten(variables["batch_stats"])
    changed = sum(
        not np.array_equal(np.asarray(before[k]), np.asarray(after[k]))
        for k in before
    )
    assert changed > 0, "TRAIN_BN=true ran but no BN stat moved"

"""Anisotropic-regime training guard: one RPN epoch + evaluation at a
z-stride-2 pyramid with VOXEL_Z_OVER_Y anchors.

The reference's core use case is anisotropic microscopy (rats 256x256x12
z-stride-1, HeLa z-stride-2 — configs/rpn/scp_rpn_rats.json,
core/utils.py:1026-1142). The full-size aniso pipeline runs via
scripts/run_aniso.sh (evidence in ANISO.md); this test pins the regime in CI
at toy scale so shape/stride bugs the isotropic suite can't see (z-strided
trunk, depth-4 feature maps, z-squashed anchors) fail a test instead of a
multi-hour run (VERDICT r3 item 8).
"""

import os

import numpy as np
import pytest

from m3d.data import synthetic
from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # RPN train-step compile (~minutes, CPU)


@pytest.fixture(scope="module")
def aniso_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aniso_data"))
    synthetic.generate_experiment(3, 64, d, seed=5, image_depth=8,
                                  voxel_z_over_y=4.0)
    synthetic.split_dataset(d, test_ratio=0.34)
    return d


def aniso_config(data_dir, **kw):
    base = dict(
        IMAGE_DEPTH=8,
        BACKBONE_STRIDES=[(4, 4, 2), (8, 8, 2), (16, 16, 2), (32, 32, 2),
                          (64, 64, 2)],
        VOXEL_Z_OVER_Y=4.0,
        # z/xy anchor ratios, the reference's anisotropic convention
        # (configs/rpn/scp_rpn_rats.json uses 0.05-0.15 at 256^2 x 12).
        RPN_ANCHOR_RATIOS=[0.25, 0.5],
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32),
    )
    base.update(kw)
    return tiny_train_config(data_dir, **base)


def test_aniso_rpn_trains_and_evaluates(aniso_dir):
    """One real epoch at 64x64x8 / z-stride-2 / VOXEL_Z_OVER_Y=4: the
    z-strided trunk compiles, anchors match the strided feature grid, losses
    are finite, and the epoch-end proposal evaluation produces a detection
    score."""
    from m3d.train.rpn import RPNTrainer

    cfg = aniso_config(aniso_dir, EPOCHS=1)
    trainer = RPNTrainer(cfg)

    # Anchor pyramid must live on the z-stride-2 grid: every level's depth
    # slots = ceil(D / z_stride) = 4.
    shapes = cfg.backbone_shapes()
    assert all(int(s[2]) == 4 for s in shapes), shapes
    n_ratios = len(cfg.RPN_ANCHOR_RATIOS)
    expected = sum(int(s[0]) * int(s[1]) * int(s[2]) * n_ratios
                   for s in shapes)
    assert trainer.anchors.shape == (expected, 6)
    # VOXEL_Z_OVER_Y squashes anchor z-extents: mean z-extent must be well
    # under mean y-extent (z voxels are 4x taller physically).
    y_ext = np.mean(trainer.anchors[:, 3] - trainer.anchors[:, 0])
    z_ext = np.mean((trainer.anchors[:, 5] - trainer.anchors[:, 2])
                    * 8.0 / 64.0)  # renormalize to same unit as y
    assert z_ext < y_ext

    variables, history = trainer.train(steps_per_epoch=2, eval_images=1)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert np.isfinite(history[0]["rpn_class_loss"])
    assert np.isfinite(history[0]["rpn_bbox_loss"])
    assert "detection_score" in history[0]
    assert os.path.exists(os.path.join(cfg.WEIGHT_DIR, "best.msgpack"))

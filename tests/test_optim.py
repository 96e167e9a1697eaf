"""Optimizer construction: injected LR, ReduceLROnPlateau wiring, freeze
masks, MaxNorm constraint scope."""

import numpy as np
import pytest

from m3d.config import Config
from m3d.train.optim import (EarlyStopping, ReduceLROnPlateau,
                             apply_constraints, build_optimizer,
                             get_learning_rate, set_learning_rate)


def _cfg(**kw):
    base = dict(OPTIMIZER={"name": "SGD",
                           "parameters": {"learning_rate": 0.1,
                                          "momentum": 0.0}},
                WEIGHT_DECAY=0.0)
    base.update(kw)
    return Config(IMAGE_SIZE=64, IMAGE_DEPTH=8, **base)


def test_injected_lr_changes_updates_without_recompile():
    """set_learning_rate on the opt state must change the applied update —
    the jitted step sees lr as data, not a compiled constant."""
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.ones((3,))}
    tx = build_optimizer(_cfg(), params)
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(0.1)

    grads = {"w": jnp.ones((3,))}

    @jax.jit
    def step(state):
        updates, new_state = tx.update(grads, state, params)
        return updates, new_state

    u1, _ = step(state)
    state2 = set_learning_rate(state, 0.05)
    assert get_learning_rate(state2) == pytest.approx(0.05)
    u2, _ = step(state2)  # same compiled fn, different lr
    np.testing.assert_allclose(np.asarray(u1["w"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u2["w"]), -0.05, rtol=1e-6)


def test_reduce_lr_on_plateau_decreases_lr():
    """The scheduler must actually lower lr after `patience` non-improving
    epochs (was dead code in round 1: constructed, never called)."""
    sched = ReduceLROnPlateau(factor=0.5, patience=2, mode="min")
    lr = 0.1
    lr = sched.update(1.0, lr)   # first epoch: baseline
    assert lr == 0.1
    lr = sched.update(1.0, lr)   # no improvement (wait=1)
    lr = sched.update(1.1, lr)   # no improvement (wait=2) -> reduce
    assert lr == pytest.approx(0.05)
    lr = sched.update(0.5, lr)   # improvement: keep
    assert lr == pytest.approx(0.05)


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="min")
    assert not es.update(1.0)
    assert not es.update(1.0)
    assert es.update(1.0)


def test_constraints_skip_frozen():
    import jax.numpy as jnp

    big = jnp.full((4, 3), 10.0)
    params = {"mrcnn_class_logits": {"kernel": big},
              "mrcnn_bbox_fc": {"kernel": big}}
    out = apply_constraints(params)
    # column norm clamped to 2.0 / 1.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["mrcnn_class_logits"]["kernel"]),
                       axis=0), 2.0, rtol=1e-5)
    frozen = apply_constraints(
        params, frozen_predicate=lambda p: "mrcnn_" in p)
    np.testing.assert_array_equal(
        np.asarray(frozen["mrcnn_class_logits"]["kernel"]), np.asarray(big))


def test_rpn_evaluation_feeds_telemetry(tmp_path):
    """rpn_evaluation(telemetry=...) must populate the proposal-quality
    counters/histograms (prop_hits / roi_xy) that drive suggest.ratios —
    dead in round 1 (update_rpn_proposals had no caller)."""
    from m3d.data import synthetic
    from m3d.data.datasets import ToyDataset
    from m3d.train.telemetry import Telemetry
    from m3d.utils.metrics import rpn_evaluation

    d = str(tmp_path / "toy")
    synthetic.generate_experiment(2, 64, d, seed=9, image_depth=8)
    synthetic.split_dataset(d, test_ratio=0.5)
    cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=8, DATA_DIR=d,
                 TELEMETRY_SAMPLE=1.0)
    ds = ToyDataset()
    ds.load_dataset(d, is_train=True, class_names=("object",))
    ds.prepare()

    def predict(image):
        # Proposals = the GT boxes of image 0 (normalized) + noise rows.
        gt, _, _ = ds.load_data(0, masks_needed=False)
        scale = np.array([64, 64, 8, 64, 64, 8], np.float32)
        props = np.concatenate(
            [gt.astype(np.float32) / scale,
             np.tile([[0.0, 0.0, 0.0, 0.1, 0.1, 0.5]], (5, 1))], 0)
        return props.astype(np.float32), np.ones(len(props), bool)

    tel = Telemetry(cfg)
    metrics = rpn_evaluation(predict, ds, cfg, max_images=1, telemetry=tel)
    assert metrics["detection_score"] > 0
    assert tel.cnt["prop_total"] > 0
    assert tel.cnt["prop_hits"] > 0
    assert len(tel.hist["roi_xy"]) > 0
    assert len(tel.hist["roi_dz"]) > 0

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


def test_keras_clipnorm_clips_per_leaf():
    """OPTIMIZER.parameters.clipnorm (the reference's rats-regime configs:
    scp_heads_rats.json Adam clipnorm=5.0, scp_rpn_rats.json SGD
    clipnorm=5.0) must clip EACH gradient tensor to the given L2 norm —
    Keras semantics, not global-norm. Silently dropping it reproduces the
    ANISO.md v2 collapse (first large step saturates the head)."""
    import jax.numpy as jnp

    cfg = _cfg(OPTIMIZER={"name": "SGD",
                          "parameters": {"learning_rate": 1.0,
                                         "momentum": 0.0,
                                         "clipnorm": 5.0}})
    tx = build_optimizer(cfg)
    params = {"big": jnp.zeros(100), "small": jnp.zeros(4)}
    grads = {"big": jnp.full(100, 3.0), "small": jnp.full(4, 0.5)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # lr=1.0, so |update| == |clipped grad|.
    assert np.isclose(float(jnp.linalg.norm(updates["big"])), 5.0, atol=1e-4)
    # The small leaf (norm 1.0) passes through unclipped — per-leaf, not
    # global (global-norm clipping would scale it down too).
    assert np.isclose(float(jnp.linalg.norm(updates["small"])), 1.0,
                      atol=1e-4)


def test_classifier_logit_clip_passes_gradient_when_saturated():
    """The ±10 logit clip is straight-through: the forward value is
    clipped (reference parity) but gradients flow even when every logit
    sits outside the band. A hard clip has zero gradient there, which
    permanently kills the classifier once one bad step saturates it —
    the failure mode ANISO.md documents for the v2 e2e run."""
    import jax
    import jax.numpy as jnp

    from m3d.models.heads import ClassifierHead

    head = ClassifierHead(pool_size=3, num_classes=2, fc_layers_size=16)
    x0 = jnp.ones((1, 4, 3, 3, 3, 8))
    variables = head.init(jax.random.PRNGKey(0), x0)
    # Force saturation through the logits bias (both columns far below
    # the clip floor — the dead-head state observed in the aniso v2 run).
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    params = variables["params"]
    params["mrcnn_class_logits"]["bias"] = jnp.array([-100.0, -120.0])
    saturated = {**variables, "params": params}

    logits, _, _ = head.apply(saturated, x0)
    assert float(jnp.max(logits)) <= 10.0
    assert float(jnp.min(logits)) >= -10.0

    def loss(p):
        lg, _, _ = head.apply({**saturated, "params": p}, x0)
        # Cross-entropy-like pull toward class 1: depends on the logit
        # DIFFERENCE, which the clip has flattened to zero.
        return -jnp.mean(jax.nn.log_softmax(lg)[..., 1])

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0, "saturated clip must not zero all gradients"


def test_keras_iteration_decay_schedule():
    """OPTIMIZER.parameters.decay follows Keras lr_t = lr/(1+decay*t)
    (reference configs/rpn/scp_rpn_rats.json passes decay=1e-4)."""
    import jax.numpy as jnp

    decay = 0.5
    params = {"w": jnp.ones((3,))}
    cfg = _cfg(OPTIMIZER={"name": "SGD",
                          "parameters": {"learning_rate": 0.1,
                                         "momentum": 0.0,
                                         "decay": decay}})
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    for t in range(3):
        updates, state = tx.update(grads, state, params)
        expected = -0.1 / (1.0 + decay * t)
        np.testing.assert_allclose(np.asarray(updates["w"]),
                                   expected * np.ones(3), rtol=1e-6)


def test_unknown_optimizer_params_warn():
    """Unsupported OPTIMIZER.parameters keys must be loudly dropped, not
    silently (the clipnorm collapse of ANISO.md v2 came from a silent drop)."""
    import contextlib
    import io

    import jax.numpy as jnp

    params = {"w": jnp.ones((3,))}
    cfg = _cfg(OPTIMIZER={"name": "SGD",
                          "parameters": {"learning_rate": 0.1,
                                         "amsgrad": True}})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        build_optimizer(cfg, params)
    out = buf.getvalue()
    assert "WARNING" in out and "amsgrad" in out


def test_size_normalized_decay_matches_reference_l2():
    """WEIGHT_DECAY_SIZE_NORMALIZED=true reproduces the reference's
    per-tensor-size L2 gradient WD*w/size(w) (core/models.py:3380-3384);
    BN gamma/beta stay exempt."""
    import jax.numpy as jnp

    wd = 0.01
    params = {"conv": {"kernel": jnp.full((2, 4), 3.0)},
              "bn1": {"scale": jnp.full((4,), 5.0)}}
    cfg = _cfg(WEIGHT_DECAY=wd, WEIGHT_DECAY_SIZE_NORMALIZED=True)
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"conv": {"kernel": jnp.zeros((2, 4))},
             "bn1": {"scale": jnp.zeros((4,))}}
    updates, _ = tx.update(grads, state, params)
    # update = -lr * (wd * w / size); size=8
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]),
                               -0.1 * wd * 3.0 / 8 * np.ones((2, 4)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["bn1"]["scale"]),
                               np.zeros((4,)), atol=1e-12)

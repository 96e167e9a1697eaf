"""1-device vs 8-device data-parallel train-step numerical equivalence.

The reference's ParallelModel relies on Keras' implicit gradient aggregation
across towers (core/parallel_model.py:75-89) — the contract is that N-way
data parallelism computes the SAME update as a single device seeing the whole
batch. Here the same batch, same params, and same RNG run one jitted RPN
train step on a 1-device mesh and on the full 8-device CPU mesh; params
after the step must match to fp32 reduction-order tolerance.
"""

import jax
import numpy as np
import pytest

from m3d.parallel.mesh import replicate, shard_batch
from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # two full train-step compiles


def test_dp_train_step_equivalence():
    from jax.sharding import Mesh

    from m3d.train.optim import build_optimizer
    from m3d.train.rpn import RPNTrainer

    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the 8-device CPU mesh"

    cfg = tiny_train_config("/tmp/unused_dp", IMAGES_PER_GPU=8)
    trainer = RPNTrainer(cfg, mode="training")
    # Host-side copy: the jitted step donates its inputs, and device_put of
    # an already-placed array can alias — donation would delete the shared
    # originals between the two runs.
    variables = jax.device_get(trainer.init_variables())

    rng = np.random.RandomState(0)
    A = trainer.anchors.shape[0]
    At = int(cfg.RPN_TRAIN_ANCHORS_PER_IMAGE)
    match = np.zeros((8, A), np.int32)
    for b in range(8):
        pos = rng.choice(A, size=12, replace=False)
        neg = rng.choice(np.setdiff1d(np.arange(A), pos), size=52,
                         replace=False)
        match[b, pos] = 1
        match[b, neg] = -1
    batch = {
        "image": rng.randn(8, 64, 64, 8, 1).astype(np.float32),
        "rpn_match": match,
        "rpn_bbox": (0.1 * rng.randn(8, At, 6)).astype(np.float32),
    }

    def run(mesh):
        params = replicate(mesh, variables["params"])
        stats = replicate(mesh, variables.get("batch_stats", {}))
        tx = build_optimizer(cfg, variables["params"])
        opt_state = replicate(mesh, tx.init(variables["params"]))
        step = trainer.make_train_step(tx)
        p, _, _, metrics = step(params, opt_state, stats,
                                shard_batch(mesh, batch))
        return jax.device_get(p), float(jax.device_get(metrics)["loss"])

    p1, loss1 = run(Mesh(np.asarray(devices[:1]), ("data",)))
    p8, loss8 = run(Mesh(np.asarray(devices[:8]), ("data",)))

    assert np.isfinite(loss1)
    assert loss1 == pytest.approx(loss8, rel=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    checked = 0
    for path, v1 in flat1:
        v8 = flat8[path]
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v8), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked > 100

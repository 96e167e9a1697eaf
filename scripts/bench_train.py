"""Training-step TPU benchmark: RPN step and e2e-head step throughput.

Measures steady-state jitted train-step wall time on synthetic device-resident
batches (no host pipeline), the analog of the reference's fit_generator inner
loop (core/models.py:3462-3472) without generator overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_train.py [size] [depth] [batch]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.anchors import normalized_pyramid_anchors  # noqa: E402
from m3d.config import Config  # noqa: E402
from m3d.image_meta import default_meta  # noqa: E402
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if a != "--aniso"]
    aniso = "--aniso" in sys.argv[1:]
    if aniso:
        # The committed anisotropic regime's geometry
        # (configs/aniso/rpn2.json: 256x256x12, z-stride 2 pyramid).
        size = int(args[0]) if len(args) > 0 else 256
        depth = int(args[1]) if len(args) > 1 else 12
        batch = int(args[2]) if len(args) > 2 else 2
        cfg = Config(
            IMAGE_SIZE=size, IMAGE_DEPTH=depth,
            BACKBONE_STRIDES=[(4, 4, 2), (8, 8, 2), (16, 16, 2),
                              (32, 32, 2), (64, 64, 2)],
            RPN_ANCHOR_SCALES=(12, 20, 28, 40, 56),
            RPN_ANCHOR_RATIOS=[0.7, 1.0, 1.3],
            PRE_NMS_LIMIT=3000, POST_NMS_ROIS_TRAINING=500,
            TRAIN_ROIS_PER_IMAGE=64, MAX_GT_INSTANCES=24,
            IMAGES_PER_GPU=batch,
            COMPUTE_DTYPE="bfloat16",
        )
    else:
        size = int(args[0]) if len(args) > 0 else 128
        depth = int(args[1]) if len(args) > 1 else 128
        batch = int(args[2]) if len(args) > 2 else 1
        cfg = Config(
            IMAGE_SIZE=size, IMAGE_DEPTH=depth,
            BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16),
                              (32, 32, 32), (64, 64, 64)],
            RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
            RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
            PRE_NMS_LIMIT=6000, POST_NMS_ROIS_TRAINING=500,
            TRAIN_ROIS_PER_IMAGE=64, MAX_GT_INSTANCES=32,
            IMAGES_PER_GPU=batch,
            COMPUTE_DTYPE="bfloat16",
        )
    model = MaskRCNN.from_config(cfg, mode="training")
    anchors = normalized_pyramid_anchors(cfg)

    rng = np.random.RandomState(0)
    A = anchors.shape[0]
    G = int(cfg.MAX_GT_INSTANCES)
    batch_np = {
        "image": rng.randn(batch, size, size, depth, 1).astype(np.float32),
        "rpn_match": rng.choice(
            [-1, 0, 1], size=(batch, A), p=[0.05, 0.9, 0.05]).astype(np.int32),
        "rpn_bbox": rng.randn(
            batch, int(cfg.RPN_TRAIN_ANCHORS_PER_IMAGE), 6).astype(np.float32),
    }

    variables = init_params(model, jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    from m3d.train.optim import build_optimizer
    from m3d.train.rpn import RPNTrainer

    tx = build_optimizer(cfg, params)
    opt_state = jax.device_put(tx.init(params))
    params = jax.device_put(params)
    data = jax.device_put(batch_np)

    trainer = RPNTrainer.__new__(RPNTrainer)  # skip dataset plumbing
    trainer.config, trainer.model = cfg, model
    step = trainer.make_train_step(tx)

    t0 = time.perf_counter()
    params, opt_state, batch_stats, metrics = step(
        params, opt_state, batch_stats, data)
    print(f"[rpn-step] compile+first(dispatch): {time.perf_counter()-t0:.1f}s",
          flush=True)

    # Honest device time on the axon tunnel: only a host fetch forces
    # execution, so run K chained steps and take the slope between two loop
    # lengths — cancels the fixed fetch cost. The step donates params/
    # opt_state/batch_stats, so every call must consume the PREVIOUS call's
    # outputs (reusing a donated handle fails at execution).
    state = [params, opt_state, batch_stats]

    def run(k):
        p, o, bs = state
        t0 = time.perf_counter()
        for _ in range(k):
            p, o, bs, m = step(p, o, bs, data)
        float(m["loss"])  # force execution
        state[0], state[1], state[2] = p, o, bs
        return time.perf_counter() - t0

    run(1)  # warm
    t2 = min(run(2) for _ in range(2))
    t10 = min(run(10) for _ in range(2))
    dt = max((t10 - t2) / 8, 1e-9)
    print(f"[rpn-step] {dt*1e3:.1f} ms/step -> "
          f"{batch/dt:.2f} vol/s/chip @{size}^2x{depth} B={batch}", flush=True)

    # ------------------------------------------------------------------
    # E2E head training step (frozen trunk + live proposals + ROI heads:
    # reference MODE training_head_e2e, core/models.py:4234-4402).
    from m3d.image_meta import default_meta
    from m3d.train.head import HeadTrainer

    cfg.MODE = "training_head_e2e"
    ht = HeadTrainer.__new__(HeadTrainer)
    ht.config, ht.model, ht.anchors = cfg, model, anchors
    e2e_step = ht.make_e2e_step(tx)

    G = int(cfg.MAX_GT_INSTANCES)
    e2e_batch = jax.device_put({
        "image": batch_np["image"],
        "image_meta": np.tile(default_meta(cfg)[None], (batch, 1)),
        "gt_class_ids": np.ones((batch, G), np.int32),
        "gt_boxes": np.tile(np.asarray(
            [[0.2, 0.2, 0.2, 0.6, 0.6, 0.8]], np.float32), (batch, G, 1)),
        "gt_masks": np.ones((batch, size, size, depth, G), np.float32),
    })
    variables2 = init_params(model, jax.random.PRNGKey(0))
    p2 = jax.device_put(variables2["params"])
    o2 = jax.device_put(tx.init(p2))
    key = jax.random.PRNGKey(1)

    bs2 = jax.device_put(variables2.get("batch_stats", {}))
    state2 = [p2, o2, bs2]

    def run_e2e(k):
        p, o, bs = state2
        t0 = time.perf_counter()
        for s in range(k):
            p, o, bs, m = e2e_step(p, o, bs, e2e_batch,
                                   jax.random.fold_in(key, s))
        float(m["pos_count"])
        state2[0], state2[1], state2[2] = p, o, bs
        return time.perf_counter() - t0

    run_e2e(1)
    t2 = min(run_e2e(2) for _ in range(2))
    t10 = min(run_e2e(10) for _ in range(2))
    dt = max((t10 - t2) / 8, 1e-9)
    print(f"[e2e-head-step] {dt*1e3:.1f} ms/step -> "
          f"{batch/dt:.2f} vol/s/chip @{size}^2x{depth} B={batch}", flush=True)


if __name__ == "__main__":
    main()

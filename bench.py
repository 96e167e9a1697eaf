"""Benchmark: full Mask R-CNN inference throughput at 128^3 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no wall-clock numbers (BASELINE.md), so vs_baseline
is reported against a nominal 1.0 volumes/sec anchor — i.e. vs_baseline ==
value. The driver records the result per round; round-over-round deltas are
the meaningful signal.

Uses the persistent JAX compilation cache (/root/.jax_cache): the first-ever
compile of the 128^3 graph through the axon remote-compile tunnel is slow
(minutes); subsequent runs hit the cache.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from m3d.anchors import normalized_pyramid_anchors
    from m3d.config import Config
    from m3d.image_meta import default_meta
    from m3d.models.mask_rcnn import MaskRCNN, init_params

    cfg = Config(
        IMAGE_SIZE=128, IMAGE_DEPTH=128,
        BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32),
                          (64, 64, 64)],
        RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
        RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
        PRE_NMS_LIMIT=6000, POST_NMS_ROIS_INFERENCE=500,
        DETECTION_MAX_INSTANCES=50,
        FPN_CLASSIF_FC_LAYERS_SIZE=512,
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    anchors = normalized_pyramid_anchors(cfg)
    # Batch 4 fills the MXU at the deep (small-extent) pyramid levels;
    # per-volume latency stays ~2x the B=1 graph while throughput doubles.
    batch = 4
    meta = np.tile(default_meta(cfg)[None], (batch, 1))
    image = np.random.RandomState(0).randn(batch, 128, 128, 128, 1).astype(
        np.float32)

    variables = jax.device_put(init_params(model, jax.random.PRNGKey(0)))
    # Input resides in HBM before timing: the generators double-buffer
    # host->device prefetch (m3d/data/generators.py prefetch_to_device), so
    # steady-state inference never waits on the host upload.
    image = jax.device_put(image)
    # variables as a jit argument: captured weights become HLO constants and
    # exceed the axon remote-compile body limit (HTTP 413).
    fwd_v = jax.jit(lambda v, img: model.apply(v, img, meta, anchors))

    def fwd(img):
        return fwd_v(variables, img)

    out = fwd(image)
    jax.block_until_ready(out)  # compile + first run

    # Steady-state throughput: enqueue all batches, block once. JAX async
    # dispatch keeps the device busy while the (single-core) host dispatches
    # the next step — per-iteration blocking would serialize host and device.
    iters = 10
    t0 = time.perf_counter()
    outs = [fwd(image) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters

    value = batch / dt
    print(json.dumps({
        "metric": "mrcnn_inference_volumes_per_sec_per_chip_128cubed",
        "value": round(value, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value, 4),
    }))


if __name__ == "__main__":
    main()

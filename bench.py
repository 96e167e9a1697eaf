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

    import jax.numpy as jnp
    from jax import lax

    variables = jax.device_put(init_params(model, jax.random.PRNGKey(0)))
    # Input resides in HBM before timing — this measures device compute,
    # not host upload (training loops overlap uploads via
    # m3d/data/generators.py prefetch_to_device).
    image = jax.device_put(image)

    # Honest device-time measurement on the axon remote runtime, which
    # (a) memoizes repeated (executable, args) dispatches and (b) treats
    # block_until_ready as a handle check — only a host data fetch forces
    # execution. So: run the full inference N times inside ONE jit as a
    # data-dependent lax.scan chain (each iteration perturbs the input with
    # a scalar derived from the previous output), return a scalar the host
    # reads, and cancel the fixed ~30ms call/fetch overhead with the slope
    # between two chain lengths. Verified on this tunnel with a bf16 matmul
    # chain: 191 TFLOP/s ~= v5e peak, i.e. the slope is pure device time.
    # variables stay a jit argument: captured weights become HLO constants
    # and exceed the axon remote-compile body limit (HTTP 413).
    def chained(n):
        # The apply reads weights and image from jit ARGUMENTS — closing
        # over them would bake giant HLO constants into the remote compile.
        def body_arg(v, img0, carry):
            out = model.apply(v, img0 + carry, meta, anchors)
            s = (jnp.sum(out["detections"]) + jnp.sum(
                out["mrcnn_masks"].astype(jnp.float32))) * 1e-12
            return s.astype(jnp.float32)

        f = jax.jit(lambda v, img0: lax.scan(
            lambda c, _: (body_arg(v, img0, c), None),
            jnp.float32(0.0), None, length=n)[0])
        float(f(variables, image))  # compile
        ts = []
        for i in range(1, 4):
            img_i = image + np.float32(i) * 1e-6
            float(jnp.sum(img_i[0, 0, 0, :2, 0]))  # materialize input
            t0 = time.perf_counter()
            float(f(variables, img_i))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Fail loudly rather than report an absurd number when noise makes the
    # slope non-positive; one retry with longer chains first.
    for lo, hi in ((2, 8), (4, 16)):
        t_lo, t_hi = chained(lo), chained(hi)
        if t_hi > 1.2 * t_lo:
            break
    else:
        raise RuntimeError(
            f"non-increasing chain timings (t_lo={t_lo:.4f}s, "
            f"t_hi={t_hi:.4f}s): measurement invalid, not reporting")
    dt = (t_hi - t_lo) / (hi - lo) / batch
    value = 1.0 / dt
    print(json.dumps({
        "metric": "mrcnn_inference_volumes_per_sec_per_chip_128cubed",
        "value": round(value, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value, 4),
    }))


if __name__ == "__main__":
    main()

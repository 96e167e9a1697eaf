"""Adaptive (chunk-gated) per-ROI stages: cost vs valid count on the TPU.

Measures the full 128³ B=4 inference pipeline with the mask / classifier
stages chunk-gated (m3d/models/inference.py), forcing the gating count to a
sweep of values so the cost curve is measured independently of what a given
weight set detects. Uses the chained-scan slope methodology (see bench.py).

  - mask stage chunked (C=10): counts 0 / 10 / 20 / 30 / 50
  - classifier stage chunked (C=125): counts 125 / 250 / 500
  - monolithic baseline for both

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_adaptive.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.anchors import normalized_pyramid_anchors  # noqa: E402
from m3d.config import Config  # noqa: E402
from m3d.image_meta import default_meta  # noqa: E402
from m3d.models.detection import refine_detections_batch  # noqa: E402
from m3d.models.inference import (chunked_roi_stage,  # noqa: E402
                                  compacted_classifier_stage,
                                  compacted_mask_stage)
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402


def tsum(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def chain_time(name, step, x0, *consts, n_lo=3, n_hi=12):
    def scan_fn(n):
        return jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: ((jnp.tanh(tsum(step(c, x, *cs))) * 1e-6).astype(
                jnp.float32), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, *consts))
        ts = []
        for i in range(1, 4):
            xi = jax.tree_util.tree_map(
                lambda a: a + jnp.asarray(i * 1e-6, a.dtype), x0)
            float(tsum(xi))
            t0 = time.perf_counter()
            float(f(xi, *consts))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    print(f"[{name}] {dt*1e3:.2f} ms/call", flush=True)
    return dt


def main(only: str | None = None):
    """only: run a single sweep section ('mono', 'mask', 'cls', 'compactmask',
    'compactcls'); None runs everything."""
    batch = 4
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
    meta = np.tile(default_meta(cfg)[None], (batch, 1))
    image = jnp.asarray(
        np.random.RandomState(0).randn(batch, 128, 128, 128, 1), jnp.float32)
    variables = jax.device_put(init_params(model, jax.random.PRNGKey(0)))
    bsd = jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32)

    def pipeline(v, img, cls_chunk=None, cls_count=None, mask_chunk=None,
                 mask_count=None):
        feats = model.apply(v, img, method=MaskRCNN.extract_features)
        _, probs, deltas = model.apply(v, list(feats),
                                       method=MaskRCNN.rpn_forward)
        props, _ = model.apply(v, probs, deltas, anchors,
                               method=MaskRCNN.propose)
        mf = list(feats[:4])

        def classify(r):
            return model.apply(v, r, meta, mf,
                               method=MaskRCNN.classify_rois)

        if cls_chunk:
            _, cprobs, cbbox = chunked_roi_stage(
                classify, props, jnp.int32(cls_count), cls_chunk)
        else:
            _, cprobs, cbbox = classify(props)

        det, _ = refine_detections_batch(
            props, cprobs, cbbox, meta, bsd,
            cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD,
            int(cfg.DETECTION_MAX_INSTANCES))

        def maskfn(r):
            return model.apply(v, r, meta, mf, method=MaskRCNN.mask_rois)

        if mask_chunk:
            masks = chunked_roi_stage(
                maskfn, det[..., :6], jnp.int32(mask_count), mask_chunk)
        else:
            masks = maskfn(det[..., :6])
        return det, masks

    def want(section):
        return only is None or only == section

    base = None
    if want("mono"):
        base = chain_time(
            "monolithic", lambda c, img, v: pipeline(v, img + c), image,
            variables)

    if want("mask"):
        for cnt in (0, 10, 20, 30, 50):
            chain_time(
                f"mask C=10 count={cnt}",
                lambda c, img, v, cnt=cnt: pipeline(
                    v, img + c, mask_chunk=10, mask_count=cnt),
                image, variables)

    if want("cls"):
        for cnt in (125, 250, 500):
            chain_time(
                f"cls C=125 count={cnt} + mask C=10 count=20",
                lambda c, img, v, cnt=cnt: pipeline(
                    v, img + c, cls_chunk=125, cls_count=cnt,
                    mask_chunk=10, mask_count=20),
                image, variables)

    # Compacted mask stage: gate on the TOTAL valid count across the batch
    # (det_valid forced to the first `total` flat slots — cost-equivalent to
    # any real distribution with that total).
    nmax = int(cfg.DETECTION_MAX_INSTANCES)

    def pipeline_compact(v, img, total, chunk=10):
        feats = model.apply(v, img, method=MaskRCNN.extract_features)
        _, probs, deltas = model.apply(v, list(feats),
                                       method=MaskRCNN.rpn_forward)
        props, _ = model.apply(v, probs, deltas, anchors,
                               method=MaskRCNN.propose)
        mf = list(feats[:4])
        _, cprobs, cbbox = chunked_roi_stage(
            lambda r: model.apply(v, r, meta, mf,
                                  method=MaskRCNN.classify_rois),
            props, jnp.int32(500), 125)
        det, _ = refine_detections_batch(
            props, cprobs, cbbox, meta, bsd,
            cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD, nmax)
        forced = (jnp.arange(batch * nmax, dtype=jnp.int32)
                  < total).reshape(batch, nmax)
        masks = compacted_mask_stage(model, v, det, forced, meta, mf,
                                     chunk=chunk)
        return det, masks

    # C=10 (first sweep) measured NEGATIVE: batch-10 conv chunks underutilize
    # vs the per-image path's [4,10]=batch-40 chunks (0.455 vs 0.356 ms/ROI
    # slope). C=40/50 match per-chunk utilization while gating on the batch
    # total.
    if want("compactmask"):
        for chunk, totals in ((40, (0, 80, 112, 160, 200)),
                              (50, (112, 200))):
            for total in totals:
                chain_time(
                    f"compact mask C={chunk} total={total}",
                    lambda c, img, v, total=total,
                    chunk=chunk: pipeline_compact(v, img + c, total, chunk),
                    image, variables)

    # Compacted classifier stage (the product path since it landed): flat
    # valid-first proposal compaction gated on the batch TOTAL. Mask stage
    # fixed at the trained-workload occupancy (compact C=40 total=186,
    # bench.py measured [50,50,43,43] detections) so the classifier curve
    # is read against a realistic downstream cost.
    npr = int(cfg.POST_NMS_ROIS_INFERENCE)

    def pipeline_compact_cls(v, img, cls_total, cls_chunk):
        feats = model.apply(v, img, method=MaskRCNN.extract_features)
        _, probs, deltas = model.apply(v, list(feats),
                                       method=MaskRCNN.rpn_forward)
        props, _ = model.apply(v, probs, deltas, anchors,
                               method=MaskRCNN.propose)
        mf = list(feats[:4])
        forced_p = (jnp.arange(batch * npr, dtype=jnp.int32)
                    < cls_total).reshape(batch, npr)
        _, cprobs, cbbox = compacted_classifier_stage(
            model, v, props, forced_p, meta, mf, chunk=cls_chunk)
        det, _ = refine_detections_batch(
            props, cprobs, cbbox, meta, bsd,
            cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD, nmax)
        forced_d = (jnp.arange(batch * nmax, dtype=jnp.int32)
                    < 186).reshape(batch, nmax)
        masks = compacted_mask_stage(model, v, det, forced_d, meta, mf,
                                     chunk=40)
        return det, masks

    if want("compactcls"):
        for chunk, totals in ((125, (2000, 1000, 500)),
                              (250, (2000, 500)),
                              (500, (2000,))):
            for total in totals:
                chain_time(
                    f"compact cls C={chunk} total={total} "
                    f"+ compact mask C=40 total=186",
                    lambda c, img, v, total=total,
                    chunk=chunk: pipeline_compact_cls(
                        v, img + c, total, chunk),
                    image, variables)

    if base is not None:
        print(f"baseline {base*1e3:.2f} ms -> vol/s = {batch/base:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

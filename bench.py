"""Benchmark: full Mask R-CNN inference throughput at 128^3 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra fields make the number auditable:

  gt_objects        total GT instances in the 4 bench volumes
  detections        how many the benched checkpoint detects (IoU>=0.5 box
                    match against GT)
  recall            detections / gt_objects — the adaptive path skips
                    padding-only chunks, so its throughput is only
                    meaningful alongside the recall it operates at (an
                    under-detecting model benches FASTER; this field stops
                    the series from silently rewarding that)
  monolithic_value  throughput of the fixed-shape graph that computes every
                    padded per-ROI slot (recall-independent workload)

Workload: the packed 128^3-trained checkpoint applied at 128^3 over 4 seeded
synthetic volumes from m3d.data.synthetic (the reference generate_data.py
formats), through the framework's default adaptive inference path
(m3d/models/inference.py).

Honesty fallback: when the trained checkpoint is absent, the bench uses
random weights (which detect nothing) and therefore forces the MONOLITHIC
graph that computes every padded slot — the round-1 workload — so the
printed number can never benefit from skipping work that a random weight set
simply fails to create. The mode actually used is reported on stderr.

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
import os
import sys
import time

import numpy as np

# Preferred: the live 128^3-trained run. Fallback: the git-tracked f16 copy
# (weights/), which survives workspace resets between rounds — restore_by_name
# casts it back to the model's param dtype.
CKPTS = (
    # r5 arc retrains the e2e head fresh in head2 (the r4 head/ dir holds a
    # stale epoch-1 best trained on the epoch-9 trunk) — prefer newest.
    "/root/repo/runs/milestone128/head2/weights/best.msgpack",
    "/root/repo/weights/bench_ckpt.f16.msgpack",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_volumes(batch: int, size: int):
    from m3d.data.datasets import normalize_volume
    from m3d.data.synthetic import create_volume

    vols, gt_boxes = [], []
    for i in range(batch):
        rng = np.random.RandomState(1000 + i)
        img, _seg, _masks, boxes, _cls = create_volume(
            (size, size, size), rng)
        vols.append(normalize_volume(img))
        gt_boxes.append(np.asarray(boxes, np.float32))
    return np.stack(vols), gt_boxes


def detection_recall(out, gt_boxes, size: int, iou_thr: float = 0.5):
    """Greedy IoU>=thr matching of detected boxes (normalized, [B,M,8])
    against per-volume GT pixel boxes. Returns (n_gt, n_matched, n_det)."""
    from m3d.data.rpn_targets import overlaps_3d_numpy

    det = np.asarray(out["detections"])
    valid = np.asarray(out["detections_valid"]).astype(bool)
    n_gt = n_match = n_det = 0
    for b, gt in enumerate(gt_boxes):
        n_gt += len(gt)
        boxes = det[b, valid[b], :6] * float(size)
        scores = det[b, valid[b], 7]
        n_det += boxes.shape[0]
        if not boxes.shape[0] or not len(gt):
            continue
        ov = overlaps_3d_numpy(boxes, gt)
        taken = set()
        for i in np.argsort(-scores):
            j = int(np.argmax(ov[i]))
            if ov[i, j] >= iou_thr and j not in taken:
                taken.add(j)
        n_match += len(taken)
    return n_gt, n_match, n_det


def main(min_confidence: float | None = None):
    """min_confidence: override DETECTION_MIN_CONFIDENCE. The driver-facing
    default (None -> 0.2, the reference core/config.py:67 class default)
    keeps the metric series comparable across rounds;
    scripts/bench_operating_point.py measures the reference's *product*
    inference operating point (configs/mrcnn/scp_mrcnn_config.json uses 0.4)
    where sparser real detection counts let the adaptive path skip work."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from m3d.anchors import normalized_pyramid_anchors
    from m3d.config import Config
    from m3d.image_meta import default_meta
    from m3d.models.inference import adaptive_inference, default_chunks
    from m3d.models.mask_rcnn import MaskRCNN, init_params

    cfg = Config(
        IMAGE_SIZE=128, IMAGE_DEPTH=128,
        BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32),
                          (64, 64, 64)],
        RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
        RPN_ANCHOR_RATIOS=[0.75, 1.0, 1.33],
        PRE_NMS_LIMIT=6000, POST_NMS_ROIS_INFERENCE=500,
        DETECTION_MAX_INSTANCES=50,
        FPN_CLASSIF_FC_LAYERS_SIZE=512,
        **({} if min_confidence is None
           else {"DETECTION_MIN_CONFIDENCE": float(min_confidence)}),
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    anchors = normalized_pyramid_anchors(cfg)
    # Batch 4 fills the MXU at the deep (small-extent) pyramid levels;
    # per-volume latency stays ~2x the B=1 graph while throughput doubles.
    batch = 4
    meta = np.tile(default_meta(cfg)[None], (batch, 1))

    variables = init_params(model, jax.random.PRNGKey(0))
    ckpt = next((p for p in CKPTS if os.path.exists(p)), None)
    image, gt_boxes = make_volumes(batch, 128)
    if ckpt is not None:
        from m3d.train.checkpoints import load_params, restore_by_name

        source, _ = load_params(ckpt)
        variables, stats = restore_by_name(variables, source)
        log(f"[bench] trained workload: restored {ckpt}: {stats}")
        cls_chunk, mask_chunk = default_chunks(model)
    else:
        # Random weights detect nothing — force the monolithic graph so the
        # measurement covers every padded per-ROI slot (round-1 workload).
        log("[bench] no trained checkpoint found: random weights, "
            "monolithic (all padded slots computed)")
        gt_boxes = [np.zeros((0, 6), np.float32)] * batch
        cls_chunk = mask_chunk = None

    import jax.numpy as jnp
    from jax import lax

    variables = jax.device_put(variables)
    # Input resides in HBM before timing — this measures device compute,
    # not host upload (training loops overlap uploads via
    # m3d/data/generators.py prefetch_to_device).
    image = jax.device_put(image)

    def make_run(cc, mc):
        def run(v, img):
            return adaptive_inference(
                model, v, img, meta, anchors,
                classifier_chunk=cc, mask_chunk=mc)

        return run

    run = make_run(cls_chunk, mask_chunk)

    # Report the workload's actual ROI occupancy AND detection recall so the
    # measured number is interpretable: the adaptive path's savings scale
    # with missed objects, so throughput without recall is meaningless.
    out = jax.device_get(jax.jit(run)(variables, image))
    n_gt, n_match, n_det = detection_recall(out, gt_boxes, 128)
    recall = n_match / n_gt if n_gt else 0.0
    log(f"[bench] valid proposals/image: "
        f"{np.asarray(out['proposals_valid'].sum(axis=1)).tolist()}, "
        f"valid detections/image: "
        f"{np.asarray(out['detections_valid'].sum(axis=1)).tolist()} "
        f"(chunks: classifier={cls_chunk}, mask={mask_chunk})")
    log(f"[bench] detection recall vs GT: {n_match}/{n_gt} = {recall:.3f} "
        f"({n_det} detections)")

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
    def throughput(run_fn, label):
        def chained(n):
            def body_arg(v, img0, carry):
                o = run_fn(v, img0 + carry)
                s = (jnp.sum(o["detections"]) + jnp.sum(
                    o["mrcnn_masks"].astype(jnp.float32))) * 1e-12
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

        # Fail loudly rather than report an absurd number when noise makes
        # the slope non-positive; one retry with longer chains first.
        for lo, hi in ((2, 8), (4, 16)):
            t_lo, t_hi = chained(lo), chained(hi)
            if t_hi > 1.2 * t_lo:
                break
        else:
            raise RuntimeError(
                f"[{label}] non-increasing chain timings (t_lo={t_lo:.4f}s, "
                f"t_hi={t_hi:.4f}s): measurement invalid, not reporting")
        dt = (t_hi - t_lo) / (hi - lo) / batch
        v = 1.0 / dt
        log(f"[bench] {label}: {v:.2f} volumes/s/chip")
        return v

    value = throughput(run, "adaptive (default path)")
    if cls_chunk is not None:
        mono = throughput(make_run(None, None),
                          "monolithic (all padded slots)")
    else:
        mono = value  # the fallback already measured the monolithic graph

    print(json.dumps({
        "metric": "mrcnn_inference_volumes_per_sec_per_chip_128cubed",
        "value": round(value, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(value, 4),
        "gt_objects": int(n_gt),
        "detections": int(n_det),
        "recall": round(recall, 4),
        "monolithic_value": round(mono, 4),
    }))


if __name__ == "__main__":
    main()

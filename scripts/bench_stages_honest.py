"""Honest per-stage device-time breakdown of 128^3 inference.

Same methodology as bench.py (chained lax.scan inside one jit + scalar
fetch + two-length slope — the axon runtime memoizes repeated dispatches and
only host reads force execution). Each stage is chained on realistic inputs
captured from one real forward; the chain perturbs the stage input with a
scalar carry derived from the stage output, forcing sequential execution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_stages_honest.py [batch]
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
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402


def tsum(t):
    """Scalar float32 sum of an arbitrary pytree."""
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


# Measured v5e bf16 peak on this tunnel (chained 4096^3 matmul, round 1).
PEAK_TFLOPS = 195.0


def stage_flops(step, x0, *consts):
    """Analytic FLOP count for one stage call from XLA's cost analysis."""
    try:
        f = jax.jit(lambda x, *cs: step(jnp.float32(0.0), x, *cs))
        cost = f.lower(x0, *consts).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"  (cost analysis unavailable: {e})", flush=True)
        return float("nan")


def chain_time(name, step, x0, *consts, n_lo=3, n_hi=12):
    """step(x, carry, *consts) -> (out_tree). Chains via scalar carry.

    Returns (dt_seconds, flops_per_call) — flops from XLA cost analysis, so
    the table shows achieved TFLOP/s and %-of-peak per stage (the roofline
    view: low %-peak + low ms = overhead-bound, low %-peak + high ms =
    memory/gather-bound, high %-peak = compute-bound, done).
    """
    def scan_fn(n):
        return jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: ((lambda o: (jnp.tanh(tsum(o)) * 1e-6).astype(
                jnp.float32))(step(c, x, *cs)), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, *consts))  # compile
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
    fl = stage_flops(step, x0, *consts)
    tfs = fl / dt / 1e12
    print(f"[{name}] {dt*1e3:.2f}ms/call  {fl/1e12:.3f} TFLOP  "
          f"{tfs:.1f} TFLOP/s  {100*tfs/PEAK_TFLOPS:.0f}%-peak", flush=True)
    return dt, fl


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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

    # One real forward to capture realistic intermediates.
    s1 = jax.jit(lambda v, img: model.apply(
        v, img, method=MaskRCNN.extract_features))
    s2 = jax.jit(lambda v, f: model.apply(v, f, method=MaskRCNN.rpn_forward))
    s3 = jax.jit(lambda v, p, d: model.apply(v, p, d, anchors,
                                             method=MaskRCNN.propose))
    s4 = jax.jit(lambda v, r, f: model.apply(v, r, meta, f[:4],
                                             method=MaskRCNN.classify_rois))
    s5 = jax.jit(lambda r, pr, bb: refine_detections_batch(
        r, pr, bb, meta, jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
        cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD,
        int(cfg.DETECTION_MAX_INSTANCES)))
    s6 = jax.jit(lambda v, d, f: model.apply(v, d[..., :6], meta, f[:4],
                                             method=MaskRCNN.mask_rois))
    feats = s1(variables, image)
    rpn = s2(variables, feats)
    props = s3(variables, rpn[1], rpn[2])
    cls = s4(variables, props[0], feats)
    det = s5(props[0], cls[1], cls[2])
    # Materialize everything host-side once, then device_put stable copies.
    feats = jax.device_put(jax.tree_util.tree_map(np.asarray, feats))
    rpn = jax.device_put(jax.tree_util.tree_map(np.asarray, rpn))
    props = jax.device_put(jax.tree_util.tree_map(np.asarray, props))
    cls = jax.device_put(jax.tree_util.tree_map(np.asarray, cls))
    det = jax.device_put(jax.tree_util.tree_map(np.asarray, det))
    print("captured intermediates", flush=True)

    # Stage chains. step(carry_scalar_applied_input, x0, *consts).
    rows = []
    rows.append(("backbone+FPN", *chain_time(
        "backbone+FPN",
        lambda c, img, v: model.apply(v, img + c,
                                      method=MaskRCNN.extract_features),
        image, variables)))
    rows.append(("RPN-head", *chain_time(
        "RPN-head",
        lambda c, f, v: model.apply(
            v, tuple(p + c for p in f), method=MaskRCNN.rpn_forward),
        feats, variables)))
    rows.append(("proposal/NMS", *chain_time(
        "proposal/NMS",
        lambda c, r, v: model.apply(v, r[1] + c, r[2] + c, anchors,
                                    method=MaskRCNN.propose),
        rpn, variables)))
    rows.append(("roialign+classifier", *chain_time(
        "roialign+classifier",
        lambda c, x, v: model.apply(
            v, x[0] + c * 1e-3, meta, [p + c for p in x[1][:4]],
            method=MaskRCNN.classify_rois),
        (props[0], feats), variables)))
    rows.append(("detection", *chain_time(
        "detection",
        lambda c, x: refine_detections_batch(
            x[0] + c, x[1] + c, x[2] + c, meta,
            jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
            cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD,
            int(cfg.DETECTION_MAX_INSTANCES)),
        (props[0], cls[1], cls[2]))))
    rows.append(("mask-head", *chain_time(
        "mask-head",
        lambda c, x, v: model.apply(
            v, x[0][..., :6] + c * 1e-3, meta, [p + c for p in x[1][:4]],
            method=MaskRCNN.mask_rois),
        (det[0], feats), variables)))

    total_dt = sum(r[1] for r in rows)
    total_fl = sum(r[2] for r in rows if np.isfinite(r[2]))
    print(f"\n| stage | ms | TFLOP | TFLOP/s | %-peak | %-time |")
    print(f"|---|---|---|---|---|---|")
    for name, dt, fl in rows:
        tfs = fl / dt / 1e12
        print(f"| {name} | {dt*1e3:.2f} | {fl/1e12:.3f} | {tfs:.1f} | "
              f"{100*tfs/PEAK_TFLOPS:.0f}% | {100*dt/total_dt:.0f}% |")
    print(f"| TOTAL | {total_dt*1e3:.2f} | {total_fl/1e12:.3f} | "
          f"{total_fl/total_dt/1e12:.1f} | "
          f"{100*total_fl/total_dt/1e12/PEAK_TFLOPS:.0f}% | 100% |")
    print(f"volumes/s/chip (sum of stages): {batch/total_dt:.1f}")


if __name__ == "__main__":
    main()

"""In-context stage attribution by pipeline ablation.

The per-stage chain harness (bench_stages_honest) disagrees with the
monolith: its stage sum is ~267ms while the full chained inference runs at
~135ms per B=4 call. Phantom costs (per-iteration feature perturbation /
lost loop-invariant hoisting) distort isolated-stage chains. This script
times CUMULATIVE partial pipelines inside the same chain harness — each
prefix is a real monolith prefix — so successive differences are the true
in-context cost of each stage.

  P0: backbone+FPN
  P1: P0 + RPN head
  P2: P1 + proposal/NMS
  P3: P2 + roialign+classifier
  P4: P3 + detection refine
  P5: P4 + roialign+mask head   (== full inference)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_ablate.py [batch]
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

    bsd = jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32)

    def p0(v, img):
        return model.apply(v, img, method=MaskRCNN.extract_features)

    def p1(v, img):
        return model.apply(v, p0(v, img), method=MaskRCNN.rpn_forward)

    def p2(v, img):
        feats = p0(v, img)
        _, probs, deltas = model.apply(v, feats,
                                       method=MaskRCNN.rpn_forward)
        return model.apply(v, probs, deltas, anchors,
                           method=MaskRCNN.propose)[0], feats

    def p3(v, img):
        props, feats = p2(v, img)
        return props, feats, model.apply(
            v, props, meta, list(feats[:4]), method=MaskRCNN.classify_rois)

    def p4(v, img):
        props, feats, (logits, probs, bbox) = p3(v, img)
        det = refine_detections_batch(
            props, probs, bbox, meta, bsd,
            cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD,
            int(cfg.DETECTION_MAX_INSTANCES))
        return det, feats

    def p5(v, img):
        det, feats = p4(v, img)
        masks = model.apply(v, det[0][..., :6], meta, list(feats[:4]),
                            method=MaskRCNN.mask_rois)
        return det[0], masks

    names = ["P0 backbone+FPN", "P1 +rpn-head", "P2 +proposal",
             "P3 +classifier", "P4 +detection", "P5 +mask (full)"]
    fns = [p0, p1, p2, p3, p4, p5]
    dts = []
    for name, fn in zip(names, fns):
        dts.append(chain_time(
            name, lambda c, img, v, f=fn: f(v, img + c), image, variables))

    print("\nstage deltas (in-context):")
    prev = 0.0
    for name, dt in zip(names, dts):
        print(f"  {name:18s} cum {dt*1e3:7.2f} ms   delta "
              f"{(dt - prev)*1e3:7.2f} ms")
        prev = dt
    print(f"volumes/s/chip (full) = {batch / dts[-1]:.1f}")


if __name__ == "__main__":
    main()

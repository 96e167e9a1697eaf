"""Isolate the roialign+classifier stage cost: real vs synthetic boxes,
gather vs whole classify_rois, and each sub-piece.

bench_stages_honest measured 102ms for classify_rois at 128^3 B=4, but the
gather alone at the same shape with synthetic boxes is 24.5ms and the
pool-cube FC conv is ~1.2ms — this probe finds the missing ~75ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_classify_probe.py
"""

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
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402
from m3d.ops.roialign3d import pyramid_roi_align  # noqa: E402


def tsum(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def chain_time(name, step, x0, *consts, n_lo=3, n_hi=12):
    def scan_fn(n):
        return jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: ((lambda o: (jnp.tanh(tsum(o)) * 1e-6).astype(
                jnp.float32))(step(c, x, *cs)), None),
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
    print(f"[{name}] {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
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

    s1 = jax.jit(lambda v, img: model.apply(
        v, img, method=MaskRCNN.extract_features))
    s2 = jax.jit(lambda v, f: model.apply(v, f, method=MaskRCNN.rpn_forward))
    s3 = jax.jit(lambda v, p, d: model.apply(v, p, d, anchors,
                                             method=MaskRCNN.propose))
    feats = s1(variables, image)
    rpn = s2(variables, feats)
    props = s3(variables, rpn[1], rpn[2])
    feats = jax.device_put(jax.tree_util.tree_map(np.asarray, feats))
    props_r = jax.device_put(np.asarray(props[0]))

    pr = np.asarray(props_r)
    sizes = (pr[..., 3:] - pr[..., :3])
    print("real proposal box stats: mean extent",
          sizes.mean(0).mean(0), "zero-box frac",
          float((np.abs(pr).sum(-1) == 0).mean()), flush=True)

    rng = np.random.RandomState(1)
    lo = rng.uniform(0, 0.6, (batch, 500, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.35, (batch, 500, 3)).astype(np.float32)
    synth = jnp.asarray(np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1))

    fl = [jnp.asarray(f) for f in feats[:4]]

    chain_time("gather @ real props",
               lambda c, b, f: pyramid_roi_align(
                   b + c * 1e-3, meta, list(f), 7),
               props_r, fl)
    chain_time("gather @ synth boxes",
               lambda c, b, f: pyramid_roi_align(
                   b + c * 1e-3, meta, list(f), 7),
               synth, fl)
    chain_time("classify_rois @ real",
               lambda c, b, v, f: model.apply(
                   v, b + c * 1e-3, meta, list(f),
                   method=MaskRCNN.classify_rois),
               props_r, variables, fl)
    chain_time("classify_rois @ synth",
               lambda c, b, v, f: model.apply(
                   v, b + c * 1e-3, meta, list(f),
                   method=MaskRCNN.classify_rois),
               synth, variables, fl)


if __name__ == "__main__":
    main()

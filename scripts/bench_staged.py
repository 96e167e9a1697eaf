"""Staged-compile TPU benchmark: per-stage compile cost + steady-state e2e.

The axon remote-compile tunnel struggles with one monolithic inference graph;
compiling the pipeline in stages (backbone+FPN / RPN / proposal / ROIAlign+
classifier / detection / mask) keeps each compile digestible and caches
incrementally. Stage boundaries keep arrays on-device; only dispatch overhead
is added.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_staged.py [size] [depth]
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
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iso = "--iso" in sys.argv
    if iso:
        # bench.py's isotropic-pyramid config (deep isotropic volumes).
        cfg = Config(
            IMAGE_SIZE=size, IMAGE_DEPTH=depth,
            BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16),
                              (32, 32, 32), (64, 64, 64)],
            RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
            RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
            PRE_NMS_LIMIT=6000, POST_NMS_ROIS_INFERENCE=500,
            DETECTION_MAX_INSTANCES=50,
            FPN_CLASSIF_FC_LAYERS_SIZE=512,
        )
    else:
        zs = max(1, depth // 64)
        cfg = Config(
            IMAGE_SIZE=size, IMAGE_DEPTH=depth,
            BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                              (64, 64, zs)],
            RPN_ANCHOR_SCALES=(8, 16, 24, 32, 48),
            RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
            PRE_NMS_LIMIT=4000, POST_NMS_ROIS_INFERENCE=500,
            DETECTION_MAX_INSTANCES=20,
        )
    model = MaskRCNN.from_config(cfg, mode="inference")
    anchors = normalized_pyramid_anchors(cfg)
    meta = default_meta(cfg)[None]
    image = np.random.RandomState(0).randn(1, size, size, depth, 1).astype(
        np.float32)

    t0 = time.perf_counter()
    variables = init_params(model, jax.random.PRNGKey(0))
    print(f"[init] {time.perf_counter()-t0:.1f}s", flush=True)

    # CRITICAL for the axon tunnel: pass variables as jit ARGUMENTS, never
    # close over them — captured params become HLO constants and blow the
    # remote-compile request body (HTTP 413).
    variables = jax.device_put(variables)
    s1 = jax.jit(lambda v, img: model.apply(v, img,
                                            method=MaskRCNN.extract_features))
    s2 = jax.jit(lambda v, f: model.apply(v, f, method=MaskRCNN.rpn_forward))
    s3 = jax.jit(lambda v, p, d: model.apply(v, p, d, anchors,
                                             method=MaskRCNN.propose))
    s4 = jax.jit(lambda v, r, f: model.apply(v, r, meta, f[:4],
                                             method=MaskRCNN.classify_rois))
    import jax.numpy as jnp

    from m3d.models.detection import refine_detections_batch

    s5 = jax.jit(lambda r, pr, bb: refine_detections_batch(
        r, pr, bb, meta, jnp.asarray(cfg.BBOX_STD_DEV, jnp.float32),
        cfg.DETECTION_MIN_CONFIDENCE, cfg.DETECTION_NMS_THRESHOLD,
        int(cfg.DETECTION_MAX_INSTANCES)))
    s6 = jax.jit(lambda v, d, f: model.apply(v, d[..., :6], meta, f[:4],
                                             method=MaskRCNN.mask_rois))

    # The axon runtime memoizes repeated (executable, args) dispatches, so
    # every timed execution must see distinct inputs: each iteration uses a
    # perturbed image, and each stage's input flows from the previous stage.
    def run_chain(img, record=None):
        def timed(name, fn, *args):
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            if record is not None:
                record.setdefault(name, []).append(time.perf_counter() - t0)
            return out

        f = timed("backbone+FPN", s1, variables, img)
        r = timed("RPN", s2, variables, f)
        p = timed("proposal/NMS", s3, variables, r[1], r[2])
        c = timed("roialign+classifier", s4, variables, p[0], f)
        d = timed("detection", s5, p[0], c[1], c[2])
        m = timed("mask-head", s6, variables, d[0], f)
        return d, m

    t0 = time.perf_counter()
    d, m = run_chain(image)  # compile all stages
    jax.block_until_ready(m)
    print(f"[compile all stages] {time.perf_counter()-t0:.1f}s", flush=True)

    rec = {}
    iters = 5
    imgs = [jax.block_until_ready(image + np.float32(i) * 1e-6)
            for i in range(1, iters + 1)]
    for img in imgs:
        d, m = run_chain(img, record=rec)
        jax.block_until_ready(m)
    for name, ts in rec.items():
        print(f"[{name}] steady: {min(ts)*1e3:.1f}ms", flush=True)

    # e2e: async-enqueue the whole chain per volume, block at the end.
    def full(img):
        f = s1(variables, img)
        r = s2(variables, f)
        p = s3(variables, r[1], r[2])
        c = s4(variables, p[0], f)
        d = s5(p[0], c[1], c[2])
        m = s6(variables, d[0], f)
        return d, m

    t0 = time.perf_counter()
    outs = [full(img) for img in imgs]
    jax.block_until_ready(outs[-1][1])
    dt = (time.perf_counter() - t0) / iters
    print(f"[staged e2e] {dt*1e3:.1f} ms/volume -> {1/dt:.2f} vol/s/chip "
          f"@{size}^2x{depth}", flush=True)
    d, m = outs[-1]
    print("det valid:", int(np.asarray(d[1]).sum()), "masks:", m.shape,
          flush=True)


if __name__ == "__main__":
    main()

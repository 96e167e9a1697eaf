"""Monolithic single-jit inference benchmark (one dispatch per volume)."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.models.mask_rcnn import MaskRCNN, init_params

size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
depth = int(sys.argv[2]) if len(sys.argv) > 2 else 64
zs = max(1, depth // 64)
cfg = Config(IMAGE_SIZE=size, IMAGE_DEPTH=depth,
             BACKBONE_STRIDES=[(4,4,1),(8,8,1),(16,16,1),(32,32,1),(64,64,zs)],
             RPN_ANCHOR_SCALES=(8,16,24,32,48), RPN_ANCHOR_RATIOS=[0.5,1.0,2.0],
             PRE_NMS_LIMIT=4000, POST_NMS_ROIS_INFERENCE=500,
             DETECTION_MAX_INSTANCES=20)
model = MaskRCNN.from_config(cfg, mode="inference")
anchors = normalized_pyramid_anchors(cfg)
meta = default_meta(cfg)[None]
image = np.random.RandomState(0).randn(1, size, size, depth, 1).astype(np.float32)

t0 = time.perf_counter()
variables = jax.device_put(init_params(model, jax.random.PRNGKey(0)))
print(f"[init] {time.perf_counter()-t0:.1f}s", flush=True)

fwd = jax.jit(lambda v, img: model.apply(v, img, meta, anchors))
t0 = time.perf_counter()
out = fwd(variables, image); jax.block_until_ready(out)
print(f"[mono] compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
iters = 10
for _ in range(iters):
    out = fwd(variables, image); jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/iters
print(f"[mono e2e] {dt*1e3:.1f} ms/volume -> {1/dt:.2f} vol/s/chip @{size}^2x{depth}", flush=True)
print("det valid:", int(np.asarray(out["detections_valid"]).sum()), flush=True)

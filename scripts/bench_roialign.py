"""ROIAlign benchmark: Pallas kernel vs XLA slab path on TPU."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.ops.roialign3d import pyramid_roi_align, pyramid_roi_align_pallas

n_rois = int(sys.argv[1]) if len(sys.argv) > 1 else 500
c = 256
rng = np.random.RandomState(7)
cfg = Config(IMAGE_SIZE=64, IMAGE_DEPTH=64, NUM_CLASSES=2)
meta = default_meta(cfg)[None]
feats = [rng.randn(1, 16, 16, 64, c).astype(np.float32),
         rng.randn(1, 8, 8, 64, c).astype(np.float32),
         rng.randn(1, 4, 4, 64, c).astype(np.float32),
         rng.randn(1, 2, 2, 64, c).astype(np.float32)]
import jax.numpy as jnp
feats = [jax.device_put(jnp.asarray(f, jnp.bfloat16)) for f in feats]
lo = rng.uniform(0, 0.45, (1, n_rois, 3)).astype(np.float32)
ext = rng.uniform(0.1, 0.5, (1, n_rois, 3)).astype(np.float32)
boxes = np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1)

def bench(name, fn):
    t0 = time.perf_counter()
    out = fn(); jax.block_until_ready(out)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(); jax.block_until_ready(out)
    run = (time.perf_counter()-t0)/5
    print(f"[{name}] compile {compile_t:.1f}s steady {run*1e3:.1f}ms", flush=True)
    return np.asarray(out)

xla = bench("xla-slab", lambda: pyramid_roi_align(boxes, meta, feats, 7))
pls = bench("pallas", lambda: pyramid_roi_align_pallas(boxes, meta, feats, 7))
print("maxdiff:", float(np.abs(xla - pls).max()), flush=True)

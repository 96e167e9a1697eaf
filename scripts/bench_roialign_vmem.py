"""Bench the VMEM-resident pallas ROIAlign at the two inference workloads.

Compares, at the 128^3 B=4 bench config:
  - classifier stage: 500 ROIs/image x pool 7^3  (auto currently: XLA gather)
  - mask stage:        50 ROIs/image x pool 14^3 (auto currently: pallas R=1)
across backends {xla-gather, pallas-vmem R in 1/2/4/8} with the chained-scan
methodology (see bench.py for why naive timing lies on this tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_roialign_vmem.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.config import Config  # noqa: E402
from m3d.image_meta import default_meta  # noqa: E402
from m3d.ops.roialign3d import (  # noqa: E402
    pyramid_roi_align, pyramid_roi_align_pallas)


def chain_time(name, fn, x0, *consts, n_lo=3, n_hi=12):
    def scan_fn(n):
        def body(c, x, *cs):
            out = fn(x + c.astype(x.dtype), *cs)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-9).astype(
                jnp.float32)

        return jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: (body(c, x, *cs), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, *consts))
        ts = []
        for i in range(1, 4):
            xi = x0 + jnp.asarray(i * 1e-6, x0.dtype)
            float(jnp.sum(xi[:2, 0, 0, 0]))
            t0 = time.perf_counter()
            float(f(xi, *consts))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    print(f"[{name}] {dt*1e3:.2f} ms/call", flush=True)
    return dt


def main():
    cfg = Config(
        IMAGE_SIZE=128, IMAGE_DEPTH=128,
        BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32),
                          (64, 64, 64)],
        RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
        RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
    )
    B, C = 4, 256
    rng = np.random.RandomState(0)
    meta = np.tile(default_meta(cfg)[None], (B, 1))
    feats = [
        jnp.asarray(rng.randn(B, 32, 32, 32, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 16, 16, 16, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 8, 8, 8, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 4, 4, 4, C), jnp.bfloat16),
    ]

    for n_rois, pool, tag in ((500, 7, "classifier"), (50, 14, "mask")):
        lo = rng.uniform(0, 0.6, (B, n_rois, 3)).astype(np.float32)
        ext = rng.uniform(0.05, 0.35, (B, n_rois, 3)).astype(np.float32)
        boxes = jnp.asarray(
            np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1))

        ref = None
        def run_gather(f0):
            return pyramid_roi_align(
                boxes, meta, [f0] + feats[1:], pool)

        dt = chain_time(f"{tag}: xla-gather", run_gather, feats[0])
        ref = np.asarray(run_gather(feats[0]), np.float32)

        def run_pallas(f0):
            return pyramid_roi_align_pallas(
                boxes, meta, [f0] + feats[1:], pool)

        got = np.asarray(run_pallas(feats[0]), np.float32)
        err = np.max(np.abs(got - ref))
        print(f"  pallas-vmem max|diff| vs gather: {err:.4f}")
        chain_time(f"{tag}: pallas-vmem(auto R)", run_pallas, feats[0])

        # Slab-DMA path (explicit slab= skips the VMEM-resident shortcut):
        # span tiers route most ROIs to 8x8x16 slabs with r_batch=8 -> 16
        # outstanding ~262KB DMAs, ~1GB total for the classifier workload.
        from m3d.ops.roialign3d import slab_sizes

        sl = slab_sizes(feats)

        def run_slab(f0):
            return pyramid_roi_align_pallas(
                boxes, meta, [f0] + feats[1:], pool, slab=sl)

        got = np.asarray(run_slab(feats[0]), np.float32)
        err = np.max(np.abs(got - ref))
        print(f"  pallas-slab max|diff| vs gather: {err:.4f}")
        chain_time(f"{tag}: pallas-slab(tiered)", run_slab, feats[0])


if __name__ == "__main__":
    main()

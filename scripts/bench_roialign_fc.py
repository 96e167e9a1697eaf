"""Bench the fused ROIAlign+FC kernel vs the unfused classifier stage.

Workload: 128^3 B=4, 500 ROIs/image, C=256, FC=512 (the bench config's
classifier stage). Compares:
  - unfused: pyramid_roi_align (XLA gather) -> conv3d_fc   (in one jit)
  - fused:   pyramid_roi_align_fc (pallas slab-DMA + in-kernel FC)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_roialign_fc.py
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
from m3d.ops.conv3d import conv3d_fc  # noqa: E402
from m3d.ops.roialign3d import (  # noqa: E402
    pyramid_roi_align, pyramid_roi_align_fc)

B, T, C, F, P = 4, 500, 256, 512, 7


def tsum(t):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(t))


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
    print(f"[{name}] {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    cfg = Config(
        IMAGE_SIZE=128, IMAGE_DEPTH=128,
        BACKBONE_STRIDES=[(4, 4, 4), (8, 8, 8), (16, 16, 16), (32, 32, 32),
                          (64, 64, 64)],
        RPN_ANCHOR_SCALES=(16, 24, 32, 48, 64),
        RPN_ANCHOR_RATIOS=[0.5, 1.0, 2.0],
    )
    meta = np.tile(default_meta(cfg)[None], (B, 1))
    feats = [
        jnp.asarray(rng.randn(B, 32, 32, 32, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 16, 16, 16, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 8, 8, 8, C), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 4, 4, 4, C), jnp.bfloat16),
    ]
    lo = rng.uniform(0, 0.6, (B, T, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.35, (B, T, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1))
    kern = jnp.asarray(rng.randn(P, P, P, C, F) * 0.01, jnp.bfloat16)

    def unfused(c, bx, f, k):
        pooled = pyramid_roi_align(bx + c * 1e-3, meta, list(f), P)
        return conv3d_fc(pooled.reshape(B * T, P, P, P, C), k,
                         preferred_element_type=jnp.float32)

    def fused(c, bx, f, k, **kw):
        return pyramid_roi_align_fc(bx + c * 1e-3, meta, list(f), P, k, **kw)

    ref = np.asarray(jax.jit(unfused)(
        jnp.float32(0), boxes, feats, kern)).reshape(B * T, F)
    got = np.asarray(fused(
        jnp.float32(0), boxes, feats, kern)).reshape(B * T, F)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"max rel diff fused vs unfused: {rel:.5f}", flush=True)

    got_k = np.asarray(fused(
        jnp.float32(0), boxes, feats, kern, kernel="kron")).reshape(
            B * T, F)
    rel_k = np.abs(got_k - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"max rel diff kron vs unfused: {rel_k:.5f}", flush=True)

    chain_time("unfused gather+fc", unfused, boxes, feats, kern)
    import functools
    import os
    kron_only = os.environ.get("BENCH_KRON_ONLY")
    variants = (
        ("fused full rb4", {}),
        ("fused full rb8 slab12", {"r_batch": 8,
                                   "fc_slab_cap": (12, 12, 24)}),
        ("fused nofc rb4", {"mode": "nofc"}),
        ("fused KRON rb8", {"kernel": "kron", "r_batch": 8}),
        ("fused KRON rb8 slab12", {"kernel": "kron", "r_batch": 8,
                                   "fc_slab_cap": (12, 12, 24)}),
        ("fused KRON rb16", {"kernel": "kron", "r_batch": 16}),
    )
    if kron_only:
        variants = tuple(v for v in variants if "KRON" in v[0])
    for label, kw in variants:
        chain_time(f"[{label}]", functools.partial(fused, **kw),
                   boxes, feats, kern)


if __name__ == "__main__":
    main()

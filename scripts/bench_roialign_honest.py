"""Honest (chained+scalar-fetch) ROIAlign benchmark at inference shapes.

Splits the dominant inference stage (pyramid ROIAlign + classifier head)
into components and compares kernel variants at B=4 x 500 ROIs, 7^3, C=256,
128^3 isotropic pyramid (P2..P5 = 32/16/8/4 cubed).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_roialign_honest.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.image_meta import compose_image_meta  # noqa: E402
from m3d.ops.roialign3d import (  # noqa: E402
    pyramid_roi_align,
    pyramid_roi_align_pallas,
)


def chain_time(name, step, x0, *consts, n_lo=3, n_hi=12):
    def tsum(t):
        leaves = jax.tree_util.tree_leaves(t)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda x, *cs: lax.scan(
            lambda c, _: ((jnp.tanh(tsum(step(c, x, *cs))) * 1e-6).astype(
                jnp.float32), None),
            jnp.float32(0.0), None, length=n)[0])
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
    print(f"[{name}] {dt*1e3:.2f}ms/call", flush=True)
    return dt


def main():
    b, n, c, p = 4, 500, 256, 7
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(b, e, e, e, c) * 0.1, jnp.bfloat16)
        for e in (32, 16, 8, 4)
    ]
    # Random boxes with realistic sizes (5-60 px at 128^3).
    lo = rng.uniform(0, 0.7, (b, n, 3)).astype(np.float32)
    ext = rng.uniform(0.04, 0.45, (b, n, 3)).astype(np.float32)
    boxes = jnp.asarray(
        np.concatenate([lo, np.minimum(lo + ext, 1.0)], -1), jnp.float32)
    meta = jnp.asarray(np.stack([compose_image_meta(
        0, (128, 128, 128, 1), (128, 128, 128, 1), (0, 0, 0, 1, 1, 1), 1.0,
        np.ones((2,), np.float32)) for _ in range(b)]), jnp.float32)

    chain_time(
        "pallas tiered (current)",
        lambda ccc, x: pyramid_roi_align_pallas(
            x[0] + ccc * 1e-4, meta, list(x[1]), p),
        (boxes, tuple(feats)))

    # Classifier head alone on aligned features.
    from m3d.models.heads import ClassifierHead

    aligned = jnp.asarray(rng.randn(b, n, p, p, p, c) * 0.1, jnp.float32)
    head = ClassifierHead(pool_size=p, num_classes=2, fc_layers_size=512)
    hv = jax.device_put(head.init(jax.random.PRNGKey(0), aligned))
    chain_time(
        "classifier head",
        lambda ccc, x, v: head.apply(v, x + ccc * 1e-3),
        aligned, hv)


if __name__ == "__main__":
    main()

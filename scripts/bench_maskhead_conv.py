"""Mask-head conv formulation shootout at the bench workload.

The mask head is 52% of inference time and runs its 3^3 c256 convs on
[B*T, 14,14,14, 256] — small-spatial, where XLA's direct 3D conv achieved
~63 TFLOP/s (32% of v5e bf16 peak) in the staged roofline. Candidates:

  direct   : lax 3D conv on [200, 14,14,14, C] (current dispatch)
  zdec     : kz-decomposed 2D convs, batch = 200*14 z-slices of 14x14
  pack-z   : ROIs packed along z with 2-voxel zero gaps -> [25, 14,14,128, C]
             (interior outputs identical to SAME-padded per-ROI conv)
  pack-y   : ROIs packed along y with 2-voxel gaps -> [8, 416,14,14, C],
             z-decomposed (big 2D spatial for the MXU)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_maskhead_conv.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.ops.conv3d import conv3d_direct, conv3d_zdec  # noqa: E402

N, S, C = 200, 14, 256  # B*T ROIs, mask pool, channels
FLOPS = 2 * N * S**3 * 27 * C * C


def chain_time(name, fn, x0, k0, n_lo=3, n_hi=12):
    def scan_fn(n):
        def body(c, x, k):
            out = fn(x + c.astype(x.dtype), k)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-9).astype(
                jnp.float32)

        return jax.jit(lambda x, k: lax.scan(
            lambda c, _: (body(c, x, k), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, k0))
        ts = []
        for i in range(1, 4):
            xi = x0 + jnp.asarray(i * 1e-6, x0.dtype)
            float(jnp.sum(xi[:1, 0, 0, :2].astype(jnp.float32)))
            t0 = time.perf_counter()
            float(f(xi, k0))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    tf = FLOPS / dt / 1e12
    print(f"[{name}] {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s "
          f"({100*tf/195:.0f}%-peak)", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, S, S, S, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.01, jnp.bfloat16)

    chain_time("direct", lambda x, k: conv3d_direct(x, k), x, k)
    chain_time("zdec", lambda x, k: conv3d_zdec(x, k), x, k)

    # pack-z: 8 ROIs per z-column, each padded to 16 deep (2-zero gap).
    def pack_z(x, k):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
        g = 8
        xp = xp.reshape(N // g, g, S, S, S + 2, C)
        xp = jnp.moveaxis(xp, 1, 3).reshape(N // g, S, S, g * (S + 2), C)
        y = conv3d_direct(xp, k)
        y = y.reshape(N // g, S, S, g, S + 2, C)
        y = jnp.moveaxis(y, 3, 1).reshape(N, S, S, S + 2, C)
        return y[:, :, :, 1:-1]

    chain_time("pack-z direct", pack_z, x, k)

    # pack-y: 25 ROIs along y (16 each incl. gap), z-decomposed 2D convs.
    def pack_y(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        g = 25
        xp = xp.reshape(N // g, g * (S + 2), S, S, C)
        y = conv3d_zdec(xp, k)
        y = y.reshape(N // g, g, S + 2, S, S, C).reshape(
            N, S + 2, S, S, C)
        return y[:, 1:-1]

    chain_time("pack-y zdec", pack_y, x, k)
    chain_time("pack-y direct",
               lambda x, k: pack_y(x, k) if False else conv3d_direct(
                   jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
                   .reshape(N // 25, 25 * (S + 2), S, S, C), k)
               .reshape(N // 25, 25, S + 2, S, S, C)
               .reshape(N, S + 2, S, S, C)[:, 1:-1],
               x, k)

    # correctness spot-check vs direct
    ref = np.asarray(conv3d_direct(x, k), np.float32)
    for name, fn in (("pack-z", pack_z),):
        got = np.asarray(fn(x, k), np.float32)
        print(f"max|{name} - direct| = {np.abs(got - ref).max():.4f}")


if __name__ == "__main__":
    main()

"""Chained-scan timing of each distinct conv shape in the 128^3 B=4 trunk.

The backbone+FPN stage runs at 31% of bf16 peak (14.1 ms for 0.849
TFLOP). This sweep times every distinct (spatial, cin, cout, kernel,
stride) conv in ResNet50-3D + FPN at that workload through the
dispatching conv3d, so the gap can be attributed per shape (vs the
mask-head's 14^3 convs which hit 97%).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_trunk_convs.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.ops.conv3d import conv3d  # noqa: E402

B = 4
PEAK = 195.0


def chain_time(name, fn, x0, k0, flops, count, n_lo=3, n_hi=12):
    def scan_fn(n):
        return jax.jit(lambda x, k: lax.scan(
            lambda c, _: ((jnp.sum(fn(x + c.astype(x.dtype), k).astype(
                jnp.float32)) * 1e-9).astype(jnp.float32), None),
            jnp.float32(0.0), None, length=n)[0])

    times = {}
    for n in (n_lo, n_hi):
        f = scan_fn(n)
        float(f(x0, k0))
        ts = []
        for i in range(1, 4):
            xi = x0 + jnp.asarray(i * 1e-6, x0.dtype)
            float(jnp.sum(xi.astype(jnp.float32)[:1, 0, 0, :2]))
            t0 = time.perf_counter()
            float(f(xi, k0))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    tf = flops / dt / 1e12
    print(f"[{name}] x{count}  {dt*1e3:6.2f} ms  {tf:6.1f} TFLOP/s "
          f"({100*tf/PEAK:3.0f}%)  stage-total {count*dt*1e3:6.2f} ms",
          flush=True)
    return dt * count


def main():
    rng = np.random.RandomState(0)

    # (label, spatial, cin, cout, k, stride, count-in-trunk)
    # ResNet50-3D at 128^3 strides (4,4,4): stem/2 -> pool/2 -> C2@32 ->
    # C3@16 -> C4@8 -> C5@4. Counts aggregate identical shapes.
    shapes = [
        ("stem 7^3 s2 1->64 @128", 128, 1, 64, 7, 2, 1),
        ("1^3 64->64 @32", 32, 64, 64, 1, 1, 3),
        ("3^3 64->64 @32", 32, 64, 64, 3, 1, 3),
        ("1^3 64->256 @32", 32, 64, 256, 1, 1, 3),
        ("1^3 256->64 @32", 32, 256, 64, 1, 1, 2),
        ("1^3 256->128 s2 @32", 32, 256, 128, 1, 2, 1),
        ("3^3 128->128 @16", 16, 128, 128, 3, 1, 4),
        ("1^3 128->512 @16", 16, 128, 512, 1, 1, 4),
        ("1^3 512->128 @16", 16, 512, 128, 1, 1, 3),
        ("3^3 256->256 @8", 8, 256, 256, 3, 1, 6),
        ("1^3 256->1024 @8", 8, 256, 1024, 1, 1, 6),
        ("1^3 1024->256 @8", 8, 1024, 256, 1, 1, 5),
        ("3^3 512->512 @4", 4, 512, 512, 3, 1, 3),
        ("1^3 512->2048 @4", 4, 512, 2048, 1, 1, 3),
        ("1^3 2048->512 @4", 4, 2048, 512, 1, 1, 2),
        # FPN: lateral 1^3 Cx->256 + output 3^3 256->256 per level
        ("fpn 1^3 256->256 @32", 32, 256, 256, 1, 1, 1),
        ("fpn 3^3 256->256 @32", 32, 256, 256, 3, 1, 1),
        ("fpn 3^3 256->256 @16", 16, 256, 256, 3, 1, 1),
    ]

    total = 0.0
    for label, s, cin, cout, k, st, count in shapes:
        x = jnp.asarray(rng.randn(B, s, s, s, cin), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(k, k, k, cin, cout) * 0.05,
                           jnp.bfloat16)
        out_s = s // st
        fl = 2 * B * out_s**3 * k**3 * cin * cout
        total += chain_time(label, lambda x, kk, st=st: conv3d(
            x, kk, strides=(st, st, st)), x, kern, fl, count)
    print(f"\nconv-only trunk total: {total*1e3:.2f} ms "
          f"(backbone+FPN stage measured 14.1 ms)", flush=True)


if __name__ == "__main__":
    main()

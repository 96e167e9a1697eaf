"""Classifier pool-cube FC-conv: direct 7^3 VALID conv vs explicit matmul.

The roialign+classifier stage burns ~100ms at 128^3 B=4 while its gather is
only ~24ms (scripts/bench_roialign_vmem.py) and its FLOPs are ~0.18 TFLOP —
the 7^3 VALID conv (kernel extent == input extent) is the suspect: XLA:TPU
lays it out as a convolution when it is exactly one [N, 343*C] x [343*C, F]
matmul.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_fcconv.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.ops.conv3d import conv3d_direct  # noqa: E402

N, P, C, F = 2000, 7, 256, 512
FLOPS = 2 * N * P**3 * C * F


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
            float(jnp.sum(xi.astype(jnp.float32)[:1, 0, 0, :2]))
            t0 = time.perf_counter()
            float(f(xi, k0))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    dt = max((times[n_hi] - times[n_lo]) / (n_hi - n_lo), 1e-9)
    tf = FLOPS / dt / 1e12
    print(f"[{name}] {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s ({100*tf/195:.0f}%)",
          flush=True)
    return dt


def fc_matmul(x, k):
    n = x.shape[0]
    return lax.dot_general(
        x.reshape(n, -1), k.reshape(-1, k.shape[-1]),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(n, 1, 1, 1, -1)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, P, P, P, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(P, P, P, C, F) * 0.01, jnp.bfloat16)

    chain_time("VALID conv7^3", lambda x, k: conv3d_direct(
        x, k, padding="VALID"), x, k)
    chain_time("matmul", fc_matmul, x, k)

    ref = np.asarray(conv3d_direct(x, k, padding="VALID"), np.float32)
    got = np.asarray(fc_matmul(x, k), np.float32)
    print("max|diff| =", np.abs(ref - got).max(),
          " scale ~", np.abs(ref).max())


if __name__ == "__main__":
    main()

"""Micro-bench each mask-head op at the bench workload to find the slow one.

The mask-head stage runs at 62.8 TFLOP/s overall while its plain 3^3 conv
alone hits ~196 TFLOP/s (scripts/bench_maskhead_conv.py) — something else in
the stage is burning the other ~90ms. Suspects: the dilation-2 conv
(mrcnn_mask_conv3b), the stride-2 ConvTranspose, elementwise BN/relu chains.

Also benches an exact matmul reformulation of the 2^3/stride-2 deconv:
non-overlapping taps mean out[2i+d] = in[i] @ W[d], i.e. 8 independent
[N*14^3, C] x [C, C] matmuls interleaved back — pure MXU work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_maskhead_pieces.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.ops.conv3d import conv3d_direct  # noqa: E402

N, S, C = 200, 14, 256


def chain_time(name, fn, x0, k0, flops, n_lo=3, n_hi=12):
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
    tf = flops / dt / 1e12
    print(f"[{name}] {dt*1e3:.2f} ms  {tf:.1f} TFLOP/s ({100*tf/195:.0f}%)",
          flush=True)
    return dt


def deconv_xla(x, k):
    """nn.ConvTranspose semantics: lax.conv_transpose, kernel [2,2,2,C,C]."""
    return lax.conv_transpose(
        x, k, strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))


def deconv_matmul(x, k):
    """Exact 2^3-stride-2 deconv as 8 matmuls + interleave.

    out[n, 2i+dy, 2j+dx, 2l+dz, o] = sum_c x[n,i,j,l,c] * k[dy,dx,dz,c,o]
    """
    n, s, _, _, c = x.shape
    xf = x.reshape(n * s * s * s, c)
    y = jnp.einsum("rc,dco->rdo", xf, k.reshape(8, c, -1),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, s, s, s, 2, 2, 2, -1)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * s, 2 * s, 2 * s, -1)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, S, S, S, C), jnp.bfloat16)
    k3 = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.01, jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(2, 2, 2, C, C) * 0.01, jnp.bfloat16)

    conv_fl = 2 * N * S**3 * 27 * C * C
    dec_fl = 2 * N * (2 * S)**3 * C * C

    chain_time("conv3 SAME", lambda x, k: conv3d_direct(x, k), x, k3,
               conv_fl)
    chain_time("conv3 dil2", lambda x, k: conv3d_direct(
        x, k, kernel_dilation=(2, 2, 2)), x, k3, conv_fl)
    chain_time("deconv xla", deconv_xla, x, k2, dec_fl)
    chain_time("deconv matmul", deconv_matmul, x, k2, dec_fl)

    # elementwise: BN-scale + relu on [N,14^3,C] bf16 (HBM roundtrip probe)
    g = jnp.asarray(rng.randn(C), jnp.bfloat16)
    chain_time("bn+relu x5", lambda x, g: _bn5(x, g), x, g,
               5 * 2 * N * S**3 * C)

    ref = np.asarray(deconv_xla(x, k2), np.float32)
    got = np.asarray(deconv_matmul(x, k2), np.float32)
    print("max|matmul-xla deconv| =", np.abs(ref - got).max(),
          " (scale ~", np.abs(ref).max(), ")")


def _bn5(x, g):
    for _ in range(5):
        x = jax.nn.relu(x * g + g)
    return x


if __name__ == "__main__":
    main()

"""Raw 3D-conv roofline probe: achieved TFLOP/s of the pipeline's hot convs.

The axon remote runtime memoizes repeated identical dispatches, so naive
call-in-a-loop timing reports absurd throughput. Each case is therefore
timed as a data-dependent chain inside ONE jit (lax.scan carrying the
activation), which forces the device to execute every iteration; wall-clock
divided by chain length is the true per-op device time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_conv.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWDC", "HWDIO", "NHWDC")


def chain_time(step, x, *consts):
    """Per-op device time via the slope between two chain lengths.

    Two things about the axon remote runtime make naive timing lie:
      - repeated (executable, args) dispatches are memoized — every timed
        call needs a distinct input;
      - block_until_ready does NOT force execution; only fetching data to
        the host does. Each chain therefore returns a scalar sum which the
        host reads (float()), and the ~30ms fixed call/fetch overhead is
        cancelled by the slope (t40 - t8) / 32.
    """
    times = {}
    for n in (8, 40):
        f = jax.jit(lambda x0, *cs: jnp.sum(lax.scan(
            lambda c, _: (step(c, *cs), None), x0, None,
            length=n)[0].astype(jnp.float32)))
        float(f(x, *consts))  # compile
        ts = []
        for i in range(1, 4):
            xi = x + jnp.asarray(i * 1e-6, x.dtype)
            float(jnp.sum(xi.astype(jnp.float32)))  # materialize input
            t0 = time.perf_counter()
            float(f(xi, *consts))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return max((times[40] - times[8]) / 32, 1e-9)


def conv_case(name, spatial, cin, cout, k, im2col=False):
    """Time conv cin->cout immediately followed by 1^3 cout->cin projection
    (so the scan carry keeps a constant shape); FLOPs count both."""
    h, w, d = spatial
    x = jnp.asarray(np.random.randn(1, h, w, d, cin) * .1, jnp.bfloat16)
    kern = jnp.asarray(np.random.randn(k, k, k, cin, cout) * .02, jnp.bfloat16)
    proj = jnp.asarray(np.random.randn(1, 1, 1, cout, cin) * .02, jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, kern.shape, DN)
    dnp = lax.conv_dimension_numbers((1, h, w, d, cout), proj.shape, DN)

    def step(c, kern, proj):
        y = lax.conv_general_dilated(c, kern, (1, 1, 1), "SAME",
                                     dimension_numbers=dn)
        y = lax.conv_general_dilated(y, proj, (1, 1, 1), "SAME",
                                     dimension_numbers=dnp)
        return jnp.tanh(y).astype(jnp.bfloat16)

    dt = chain_time(step, x, kern, proj)
    vox = h * w * d
    gf = 2 * (k ** 3 * cin * cout + cout * cin) * vox / 1e9
    print(f"[{name}] conv {spatial} c{cin}->c{cout} k{k} (+proj): "
          f"{dt*1e3:.2f}ms  {gf:.1f} GFLOP  {gf/dt/1e3:.1f} TFLOP/s",
          flush=True)

    if im2col and k == 3:
        kk = np.transpose(np.asarray(kern, np.float32), (3, 0, 1, 2, 4))
        kk = jnp.asarray(kk.reshape(cin * 27, cout), jnp.bfloat16)

        def step2(c, kk, proj):
            patches = lax.conv_general_dilated_patches(
                c, (3, 3, 3), (1, 1, 1), "SAME", dimension_numbers=dn)
            y = jnp.einsum("bhwdp,pc->bhwdc", patches, kk)
            y = lax.conv_general_dilated(y, proj, (1, 1, 1), "SAME",
                                         dimension_numbers=dnp)
            return jnp.tanh(y).astype(jnp.bfloat16)

        dt2 = chain_time(step2, x, kk, proj)
        print(f"          im2col+mm: {dt2*1e3:.2f}ms  {gf/dt2/1e3:.1f} "
              f"TFLOP/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # pure matmul reference point (chained)
    n = 4096
    a = jnp.asarray(np.random.randn(n, n) * .01, jnp.bfloat16)
    b = jnp.asarray(np.random.randn(n, n) * .01, jnp.bfloat16)
    dt = chain_time(lambda c, b: jnp.tanh(c @ b).astype(jnp.bfloat16), a, b)
    gf = 2 * n ** 3 / 1e9
    print(f"[matmul {n}^3] {dt*1e3:.2f}ms  {gf/dt/1e3:.1f} TFLOP/s",
          flush=True)

    conv_case("rpn-P2", (32, 32, 32), 256, 512, 3, im2col=True)
    conv_case("fpn-P2", (32, 32, 32), 256, 256, 3, im2col=True)
    conv_case("res2-3x3", (32, 32, 32), 64, 64, 3, im2col=True)
    conv_case("res3-3x3", (16, 16, 16), 128, 128, 3, im2col=True)
    conv_case("res4-3x3", (8, 8, 8), 256, 256, 3, im2col=True)
    conv_case("res2-1x1", (32, 32, 32), 64, 256, 1)
    # z-stride-1 anisotropic shapes (the rats-config pyramid: z stays deep)
    conv_case("rpn-P2-aniso", (64, 64, 12), 256, 512, 3, im2col=True)
    conv_case("res2-3x3-aniso", (64, 64, 12), 64, 64, 3, im2col=True)


if __name__ == "__main__":
    main()

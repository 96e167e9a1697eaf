"""Anisotropic 3D conv strategies probe.

XLA's direct conv3d runs near MXU peak on isotropic shapes (32^3: ~139
TFLOP/s) but collapses on shallow-z anisotropic shapes ((64,64,12): ~26
TFLOP/s) — exactly the shape of every pyramid level in the reference's
rats/hela configs (BACKBONE_STRIDES z=1 keeps D=12 through the trunk).

Candidate rewrites, all mathematically exact:
  A. direct conv3d (baseline)
  B. kz-decomposition: conv3d(3^3) == sum_kz conv2d(3x3, K[:,:,kz]) over
     z-shifted inputs, with (B,D) folded into the conv2d batch dim.
  C. B but via one conv2d with input-feature = C*3 (stack the 3 z-shifts
     into channels) — one big MXU contraction instead of 3.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_aniso_conv.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN3 = ("NHWDC", "HWDIO", "NHWDC")
DN2 = ("NHWC", "HWIO", "NHWC")


def chain_time(step, x, *consts):
    times = {}
    for n in (4, 16):
        f = jax.jit(lambda x0, *cs: jnp.sum(lax.scan(
            lambda c, _: (step(c, *cs), None), x0, None,
            length=n)[0].astype(jnp.float32)))
        float(f(x, *consts))
        ts = []
        for i in range(1, 4):
            xi = x + jnp.asarray(i * 1e-6, x.dtype)
            float(jnp.sum(xi.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(f(xi, *consts))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return max((times[16] - times[4]) / 12, 1e-9)


def case(h, w, d, cin, cout):
    x = jnp.asarray(np.random.randn(1, h, w, d, cin) * .1, jnp.bfloat16)
    kern = jnp.asarray(np.random.randn(3, 3, 3, cin, cout) * .02, jnp.bfloat16)
    proj = jnp.asarray(np.random.randn(1, 1, 1, cout, cin) * .02, jnp.bfloat16)
    dn3 = lax.conv_dimension_numbers(x.shape, kern.shape, DN3)
    dnp = lax.conv_dimension_numbers((1, h, w, d, cout), proj.shape, DN3)
    gf = 2 * (27 * cin * cout + cout * cin) * h * w * d / 1e9

    def project(y, proj):
        y = lax.conv_general_dilated(y, proj, (1, 1, 1), "SAME",
                                     dimension_numbers=dnp)
        return jnp.tanh(y).astype(jnp.bfloat16)

    # A: direct
    def step_a(c, kern, proj):
        y = lax.conv_general_dilated(c, kern, (1, 1, 1), "SAME",
                                     dimension_numbers=dn3)
        return project(y, proj)

    dt = chain_time(step_a, x, kern, proj)
    print(f"[{h}x{w}x{d} c{cin}->c{cout}] A direct : {dt*1e3:.2f}ms "
          f"{gf/dt/1e3:.1f} TFLOP/s", flush=True)

    # B: kz-decomposed conv2d over (B*D) batch
    def step_b(c, kern, proj):
        # c [1,H,W,D,C] -> [D,H,W,C]
        xb = c[0].transpose(2, 0, 1, 3)
        xp = jnp.pad(xb, ((1, 1), (0, 0), (0, 0), (0, 0)))
        y = None
        for kz in range(3):
            k2 = kern[:, :, kz]  # [3,3,cin,cout]
            dn2 = lax.conv_dimension_numbers((d, h, w, cin), k2.shape, DN2)
            part = lax.conv_general_dilated(
                xp[kz:kz + d], k2, (1, 1), "SAME", dimension_numbers=dn2)
            y = part if y is None else y + part
        y = y.transpose(1, 2, 0, 3)[None]  # [1,H,W,D,cout]
        return project(y, proj)

    dt = chain_time(step_b, x, kern, proj)
    print(f"[{h}x{w}x{d} c{cin}->c{cout}] B kz-2d  : {dt*1e3:.2f}ms "
          f"{gf/dt/1e3:.1f} TFLOP/s", flush=True)

    # C: single conv2d with stacked z-shift channels (cin*3)
    def step_c(c, kern, proj):
        xb = c[0].transpose(2, 0, 1, 3)  # [D,H,W,C]
        xp = jnp.pad(xb, ((1, 1), (0, 0), (0, 0), (0, 0)))
        stacked = jnp.concatenate([xp[kz:kz + d] for kz in range(3)],
                                  axis=-1)  # [D,H,W,3C]
        k2 = kern.transpose(2, 0, 1, 3, 4).reshape(3, 3, 3 * cin, cout)
        # kern [3,3,3,cin,cout] -> kz-major stacking must match concat order
        k2 = jnp.concatenate([kern[:, :, kz] for kz in range(3)], axis=2)
        dn2 = lax.conv_dimension_numbers((d, h, w, 3 * cin), k2.shape, DN2)
        y = lax.conv_general_dilated(stacked, k2, (1, 1), "SAME",
                                     dimension_numbers=dn2)
        y = y.transpose(1, 2, 0, 3)[None]
        return project(y, proj)

    dt = chain_time(step_c, x, kern, proj)
    print(f"[{h}x{w}x{d} c{cin}->c{cout}] C stacked: {dt*1e3:.2f}ms "
          f"{gf/dt/1e3:.1f} TFLOP/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    case(64, 64, 12, 256, 512)   # RPN@P2, rats pyramid
    case(64, 64, 12, 256, 256)   # FPN smoothing
    case(64, 64, 12, 64, 64)     # res2 3^3
    case(32, 32, 32, 256, 512)   # iso control (direct should stay ~139)


if __name__ == "__main__":
    main()

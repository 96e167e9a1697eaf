"""Isolate the classifier HEAD cost (12ms in-graph vs ~2ms expected).

classify_rois = gather (24.4ms) + head (12.1ms) at 128^3 B=4 / 500 ROIs /
C=256 / FC=512. The head's FLOPs (0.18 TFLOP) and traffic (~0.4GB) price at
~2-3ms, so ~9ms is overhead. Suspects, each timed here on a captured-shape
input [2000,7,7,7,256] bf16:

  A. full ClassifierHead.apply           (what the model runs)
  B. conv3d_fc formulation: reshape(n,-1) then dot   (current)
  C. multi-dim dot_general, no reshape   (layout-friendly?)
  D. B + BN/relu + 1^3 conv + BN/relu    (shared trunk, no denses)
  E. f32 Dense pair on [4,500,512]       (logit/bbox tails)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_head_fc.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from m3d.models.heads import ClassifierHead  # noqa: E402

B, T, P, C, FC = 4, 500, 7, 256, 512


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
    x = jnp.asarray(rng.randn(B, T, P, P, P, C), jnp.bfloat16)
    head = ClassifierHead(pool_size=P, num_classes=2, fc_layers_size=FC)
    variables = head.init(jax.random.PRNGKey(0), x)

    chain_time("A head full", lambda c, x, v: head.apply(v, x + c),
               x, variables)

    k = jnp.asarray(rng.randn(P, P, P, C, FC) * 0.01, jnp.bfloat16)

    def fc_reshape(c, x, k):
        xf = (x + c).reshape(B * T, -1)
        return lax.dot_general(xf, k.reshape(-1, FC), (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    chain_time("B fc reshape-dot", fc_reshape, x.reshape(B * T, P, P, P, C), k)

    def fc_multidim(c, x, k):
        return lax.dot_general(
            x + c, k, (((1, 2, 3, 4), (0, 1, 2, 3)), ((), ())),
            preferred_element_type=jnp.float32)

    chain_time("C fc multidim-dot", fc_multidim,
               x.reshape(B * T, P, P, P, C), k)

    g = jnp.asarray(rng.randn(FC), jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(FC, FC) * 0.01, jnp.bfloat16)

    def shared(c, x, k):
        y = fc_reshape(c, x, k).astype(jnp.bfloat16)
        y = jax.nn.relu(y * g + g)
        y = lax.dot_general(y, k2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
        return jax.nn.relu(y * g + g)

    chain_time("D fc+bn+1x1+bn", shared, x.reshape(B * T, P, P, P, C), k)

    kl = jnp.asarray(rng.randn(FC, 2) * 0.01, jnp.float32)
    kb = jnp.asarray(rng.randn(FC, 12) * 0.001, jnp.float32)
    sh = jnp.asarray(rng.randn(B * T, FC), jnp.float32)

    def denses(c, s):
        s = s + c
        lo = jnp.clip(s @ kl, -10, 10)
        return jax.nn.softmax(lo, -1), s @ kb

    chain_time("E f32 dense tails", denses, sh)

    # F/G: gather -> head composed in ONE jit, without and with an
    # optimization barrier at the interface. If F >> gather+head while
    # G ~= gather+head, XLA is fusing the 8-corner interpolation into the
    # FC matmul's operand load (recomputing it per K-pass) and the fix is
    # a barrier in classify_rois.
    from m3d.config import Config
    from m3d.image_meta import default_meta
    from m3d.ops.roialign3d import pyramid_roi_align

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
    lo_ = rng.uniform(0, 0.6, (B, T, 3)).astype(np.float32)
    ext = rng.uniform(0.05, 0.35, (B, T, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo_, np.minimum(lo_ + ext, 1)], -1))

    def comp(c, bx, f, v, barrier):
        al = pyramid_roi_align(bx + c * 1e-3, meta, list(f), P)
        if barrier:
            al = lax.optimization_barrier(al)
        return head.apply(v, al)

    chain_time("F gather+head fused", lambda c, bx, f, v: comp(
        c, bx, f, v, False), boxes, feats, variables)
    chain_time("G gather+barrier+head", lambda c, bx, f, v: comp(
        c, bx, f, v, True), boxes, feats, variables)

    # H/I: how much of F is the gather OUTPUT materialization? The
    # standalone gather chain lets XLA fuse the reduction into the gather
    # and never write the [2000,7,7,7,256] tensor; a barrier forces the
    # write. I additionally flattens the pool dims first ([2000,343,256]
    # pads 343->344 instead of 7->8 per axis = 1.49x).
    chain_time("H gather+barrier only", lambda c, bx, f: lax.
               optimization_barrier(pyramid_roi_align(
                   bx + c * 1e-3, meta, list(f), P)), boxes, feats)
    chain_time("I gather+flat+barrier", lambda c, bx, f: lax.
               optimization_barrier(pyramid_roi_align(
                   bx + c * 1e-3, meta, list(f), P).reshape(B * T, -1, C)),
               boxes, feats)


if __name__ == "__main__":
    main()

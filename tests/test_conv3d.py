"""conv3d kz-decomposition must match XLA's direct conv3d exactly.

The decomposed path is the TPU compute primitive for every k>1 conv in the
trunk (m3d/ops/conv3d.py); direct lax.conv_general_dilated is the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3d.ops.conv3d import ZConv, conv3d_direct, conv3d_zdec


def _case(shape, kshape, strides, padding, dilation=(1, 1, 1), seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(*kshape) * 0.1, jnp.float32)
    a = conv3d_direct(x, k, strides, padding, dilation)
    b = conv3d_zdec(x, k, strides, padding, dilation)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-4)


def test_3cubed_same():
    _case((2, 8, 8, 6, 5), (3, 3, 3, 5, 7), (1, 1, 1), "SAME")


def test_3cubed_same_strided():
    _case((1, 9, 9, 7, 4), (3, 3, 3, 4, 6), (2, 2, 2), "SAME")


def test_3cubed_aniso_stride():
    _case((2, 8, 8, 12, 4), (3, 3, 3, 4, 6), (2, 2, 1), "SAME")


def test_7cubed_stem_padding():
    # The backbone stem: 7^3, stride (2,2,1), explicit pad 3.
    _case((1, 16, 16, 9, 1), (7, 7, 7, 1, 8), (2, 2, 1), [(3, 3)] * 3)


def test_valid_pool_conv():
    # Classifier "FC" conv: pool^3 VALID on pool-sized input -> 1x1x1.
    _case((4, 7, 7, 7, 8), (7, 7, 7, 8, 16), (1, 1, 1), "VALID")


def test_dilated():
    # Mask-head conv3b: dilation 2.
    _case((2, 10, 10, 8, 4), (3, 3, 3, 4, 4), (1, 1, 1), "SAME", (2, 2, 2))


def test_odd_depth_stride2():
    _case((1, 8, 8, 5, 3), (3, 3, 3, 3, 4), (1, 1, 2), "SAME")


def test_zconv_matches_nn_conv():
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 6, 4), jnp.float32)
    ref = nn.Conv(6, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
    zc = ZConv(6, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
    vr = ref.init(rng, x)
    # Identical param tree -> ZConv can consume nn.Conv params directly.
    out_ref = ref.apply(vr, x)
    out_z = zc.apply(vr, x)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_z),
                               rtol=1e-5, atol=1e-4)


def test_zconv_grad():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 5, 3), jnp.float32)
    zc = ZConv(4, (3, 3, 3))
    v = zc.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(zc.apply(v, x) ** 2)

    g = jax.grad(loss)(v, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_zdec_bf16_f32_partial_accumulation():
    """At bf16 the kz-decomposition must not drift from the direct conv in
    the regime the trunk actually runs in (BN-normalized unit-scale
    activations): partials are summed in f32 (conv3d_zdec), so the only
    divergence is one rounding per kz partial. A 7-tap z kernel (the stem)
    would show clear drift if partials were still summed in bf16."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 40, 40, 12, 8).astype(np.float32)
    k = (rng.randn(7, 7, 7, 8, 8) / 7.0).astype(np.float32)

    want = np.asarray(
        conv3d_direct(jnp.asarray(x), jnp.asarray(k)), np.float32)
    got = np.asarray(
        conv3d_zdec(jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(k, jnp.bfloat16)), np.float32)
    base = np.asarray(
        conv3d_direct(jnp.asarray(x, jnp.bfloat16),
                      jnp.asarray(k, jnp.bfloat16)), np.float32)
    scale = np.abs(want).mean()
    err = np.quantile(np.abs(got - want), 0.99) / scale
    err_direct = np.quantile(np.abs(base - want), 0.99) / scale
    # Within a small factor of the direct bf16 conv's own rounding error —
    # i.e. per-partial rounding, not kd-fold bf16 partial-sum drift.
    assert err < 4 * max(err_direct, 2.0 ** -8), (err, err_direct)


def test_zdec_bf16_grad_dtypes():
    """Backward through the bf16 z-decomposed conv must run (the f32
    accumulation cast is autodiff-safe; a preferred_element_type mismatch
    here is what broke the conv transpose rule)."""
    x = jnp.asarray(np.random.RandomState(4).randn(1, 36, 36, 5, 4),
                    jnp.bfloat16)
    zc = ZConv(4, (3, 3, 3), dtype=jnp.bfloat16)
    v = zc.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda v: jnp.sum(
        zc.apply(v, x).astype(jnp.float32) ** 2))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)


def test_conv3d_fc_matches_direct():
    """Full-extent VALID conv == matmul dispatch (conv3d_fc)."""
    import numpy as np
    import jax.numpy as jnp

    from m3d.ops.conv3d import conv3d, conv3d_direct

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(5, 7, 7, 7, 16), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 7, 16, 24) * 0.1, jnp.float32)
    got = conv3d(x, k, padding="VALID")
    ref = conv3d_direct(x, k, padding="VALID")
    assert got.shape == (5, 1, 1, 1, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_conv3d_fc_gradients():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from m3d.ops.conv3d import conv3d, conv3d_direct

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 3, 3, 3, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6) * 0.1, jnp.float32)
    g1 = jax.grad(lambda k: jnp.sum(conv3d(x, k, padding="VALID") ** 2))(k)
    g2 = jax.grad(
        lambda k: jnp.sum(conv3d_direct(x, k, padding="VALID") ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_s2d_matches_direct(rng):
    """conv3d_s2d (space-to-depth fold, kept as a documented negative
    result) is arithmetically exact vs conv3d_direct across stride and
    padding configs."""
    from m3d.ops.conv3d import _norm_padding, conv3d_direct, conv3d_s2d

    for (h, w, d), strides, k, cin, pad in [
        ((32, 32, 16), (2, 2, 1), 7, 1, [(3, 3)] * 3),
        ((20, 20, 12), (2, 2, 2), 7, 2, "SAME"),
        ((16, 16, 16), (2, 1, 2), 5, 1, "SAME"),
        ((18, 18, 10), (2, 2, 2), 7, 1, "VALID"),
    ]:
        x = rng.randn(2, h, w, d, cin).astype(np.float32)
        kern = (rng.randn(k, k, k, cin, 8) * 0.1).astype(np.float32)
        ref = np.asarray(conv3d_direct(x, kern, strides, pad))
        pads = _norm_padding(pad, (k, k, k), strides, (h, w, d), (1, 1, 1))
        got = np.asarray(conv3d_s2d(x, kern, strides, pads))
        assert got.shape == ref.shape, (strides, pad)
        np.testing.assert_allclose(got, ref, atol=1e-4)

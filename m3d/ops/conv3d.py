"""TPU-fast 3D convolution via kz-decomposition into 2D convolutions.

XLA:TPU's direct 3D convolution runs near MXU peak on isotropic activation
shapes but collapses on shallow-z anisotropic shapes — e.g. a 3^3 conv
256->512 on (64,64,12) achieves ~26 TFLOP/s direct vs ~117 TFLOP/s when
decomposed (measured on v5e, scripts/bench_aniso_conv.py). Shallow-z is the
*normal* regime for this framework: the reference keeps z-stride 1 through
the trunk for anisotropic microscopy (BACKBONE_STRIDES z=1, reference
core/models.py:235-273), so every pyramid level is (H,W,12)-shaped.

The decomposition is exact: a (kh,kw,kd) conv equals the sum over kz of a
(kh,kw) 2D conv of the kz-th kernel z-slab applied to the z-shifted input,
with the (batch, z) axes folded into the 2D conv's batch dimension. Each 2D
conv accumulates its taps in f32 on the MXU, and the cross-kz partial sum
also runs in f32 (see conv3d_zdec) — at bf16 the only divergence from the
direct path is one rounding per kz partial.

``conv3d`` dispatches: z-decomposition when the z-kernel extent > 1 on TPU
backends, direct ``lax.conv_general_dilated`` otherwise (CPU tests, 1^3
convs). ``ZConv`` is a drop-in flax module with nn.Conv's parameter naming
("kernel" [kh,kw,kd,Cin,Cout], "bias" [Cout]) so checkpoints and the
reference-keyed param tree are unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any

DN3 = ("NHWDC", "HWDIO", "NHWDC")
DN2 = ("NHWC", "HWIO", "NHWC")


def _norm_padding(padding, kernel_size, strides, in_sizes, dilation):
    """Resolve SAME/VALID/explicit padding to per-axis (lo, hi) pairs.

    kernel_size here means the *effective* extent (k-1)*dilation + 1.
    """
    eff = [(k - 1) * dl + 1 for k, dl in zip(kernel_size, dilation)]
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return [(0, 0)] * 3
        if padding.upper() != "SAME":
            raise ValueError(f"unsupported padding {padding!r}")
        pads = []
        for k, s, n in zip(eff, strides, in_sizes):
            out = -(-n // s)  # ceil
            total = max((out - 1) * s + k - n, 0)
            pads.append((total // 2, total - total // 2))
        return pads
    return [tuple(p) for p in padding]


def conv3d_direct(x, kernel, strides=(1, 1, 1), padding="SAME",
                  kernel_dilation=(1, 1, 1), preferred_element_type=None):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, DN3)
    return lax.conv_general_dilated(
        x, kernel, tuple(strides), padding, dimension_numbers=dn,
        rhs_dilation=tuple(kernel_dilation),
        preferred_element_type=preferred_element_type)


def conv3d_zdec(x, kernel, strides=(1, 1, 1), padding="SAME",
                kernel_dilation=(1, 1, 1), preferred_element_type=None):
    """Exact (kh,kw,kd) conv as sum of kd 2D convs over (batch*z).

    x: [B,H,W,D,C], kernel: [kh,kw,kd,Cin,Cout] -> [B,H',W',D',Cout].
    """
    b, h, w, d, cin = x.shape
    kh, kw, kd, _, cout = kernel.shape
    sy, sx, sz = (int(s) for s in strides)
    dy, dx, dz = (int(v) for v in kernel_dilation)
    (py, pyh), (px, pxh), (pz, pzh) = _norm_padding(
        padding, (kh, kw, kd), (sy, sx, sz), (h, w, d), (dy, dx, dz))

    kd_eff = (kd - 1) * dz + 1
    d_out = (d + pz + pzh - kd_eff) // sz + 1
    # Pad z only; xy padding is handled by the inner 2D conv.
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pz, pzh), (0, 0)))
    # One transpose to [B, Dp, H, W, C]; per-kz strided slices then fold
    # (B, D') into the conv2d batch.
    xp = xp.transpose(0, 3, 1, 2, 4)

    # The cross-kz sum runs in f32 regardless of the conv dtype: each 2D
    # conv accumulates its taps in f32 on the MXU and rounds once, and the
    # partials are summed in f32 before a single final downcast — at bf16
    # the result differs from direct conv3d only by the per-kz rounding,
    # not by bf16 partial-sum drift. (preferred_element_type is NOT used to
    # force an f32 conv output: jax's conv transpose rule requires matching
    # operand/cotangent dtypes and would fail in the backward pass.)
    acc_dtype = preferred_element_type or jnp.promote_types(
        x.dtype, jnp.float32)
    y = None
    for kz in range(kd):
        off = kz * dz
        stop = off + (d_out - 1) * sz + 1
        sl = lax.slice_in_dim(xp, off, stop, stride=sz, axis=1)
        sl = sl.reshape(b * d_out, h, w, cin)
        k2 = kernel[:, :, kz]  # [kh,kw,Cin,Cout]
        dn2 = lax.conv_dimension_numbers(sl.shape, k2.shape, DN2)
        part = lax.conv_general_dilated(
            sl, k2, (sy, sx), [(py, pyh), (px, pxh)],
            dimension_numbers=dn2, rhs_dilation=(dy, dx)).astype(acc_dtype)
        y = part if y is None else y + part
    y = y.astype(preferred_element_type or x.dtype)
    ho, wo = y.shape[1], y.shape[2]
    return y.reshape(b, d_out, ho, wo, cout).transpose(0, 2, 3, 1, 4)


def conv3d_s2d(x, kernel, strides, padding, preferred_element_type=None):
    """Stride-2 conv as a stride-1 conv on space-to-depth input.

    MEASURED SLOWER — kept as a documented negative result, NOT
    dispatched. The ResNet stem (7^3, stride 2, Cin=1, reference
    core/models.py:241) runs at 8% of MXU peak (2.95 ms via the zdec
    path at the 128^3 B=4 bench), and space-to-depth is the classic fix:
    fold each stride-2 axis into 2 channels so the conv becomes 4-tap
    stride-1 over 8*Cin channels. On v5e the fold itself is the wall at
    Cin=1: the (2,2,2)-interleave relayout of a scalar-channel volume
    costs more than the conv it accelerates — 8.97 ms via reshape/
    transpose fold, 25.8 ms via strided-slice fold, vs 2.95 ms zdec
    status quo. The arithmetic is exact (CPU-verified vs conv3d_direct
    across stride/padding configs); revisit only if the stem input ever
    arrives pre-folded from the host. Exact tap mapping per stride-2
    axis:

        out[o] = sum_t xp[2o + t] k[t]          (t in [0, 7), xp padded)
               = sum_{d in [0,4), p in {0,1}} xp2[o + d, p] k[2d + p]

    with xp2[m, p] = xp[2m + p] and k[7] := 0. Stride-1 axes keep their
    original extent. Requires explicit per-axis padding (the caller's
    [(3,3)] stem padding) and no dilation.
    """
    b, h, w, d, cin = x.shape
    kh, kw, kd, _, cout = kernel.shape
    s = tuple(int(v) for v in strides)
    pads = [tuple(p) for p in padding]
    assert all(v in (1, 2) for v in s)

    # Pad explicitly; extend each stride-2 axis on the right so (a) its
    # length is even for the fold and (b) the folded VALID conv covers
    # every original output position.
    sizes = (h, w, d)
    ks = (kh, kw, kd)
    xpads = [(0, 0)]
    out_sizes = []
    k_new = []
    for ax in range(3):
        lo, hi = pads[ax]
        n_out = (sizes[ax] + lo + hi - ks[ax]) // s[ax] + 1
        out_sizes.append(n_out)
        if s[ax] == 2:
            kf = (ks[ax] + 2) // 2          # folded extent (7 -> 4)
            # Folded input must reach index (n_out - 1) + kf per pair.
            need = 2 * ((n_out - 1) + kf)
            xpads.append((lo, max(hi, need - sizes[ax] - lo)))
            k_new.append(kf)
        else:
            xpads.append((lo, hi))
            k_new.append(ks[ax])
    xpads.append((0, 0))
    xp = jnp.pad(x, xpads)

    # Space-to-depth fold of the stride-2 axes (channel-minor order
    # (py, px, pz, cin) to match the kernel remap below).
    shp = [b]
    perm_src = []
    for ax, size in enumerate(xp.shape[1:4]):
        if s[ax] == 2:
            shp.extend([size // 2, 2])
        else:
            shp.extend([size, 1])
    shp.append(cin)
    xp = xp.reshape(shp)                     # [b, H2,py, W2,px, D2,pz, c]
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xp = xp.reshape(xp.shape[:4] + (-1,))    # [b, H2, W2, D2, py*px*pz*c]

    # Kernel remap: k4[dy,dx,dz, (py,px,pz,c), o] = k7[2dy+py, ...] with
    # out-of-range taps zero.
    kpad = jnp.pad(kernel, [(0, 2 * k_new[0] - kh if s[0] == 2 else 0),
                            (0, 2 * k_new[1] - kw if s[1] == 2 else 0),
                            (0, 2 * k_new[2] - kd if s[2] == 2 else 0),
                            (0, 0), (0, 0)])
    shp_k = []
    for ax in range(3):
        if s[ax] == 2:
            shp_k.extend([k_new[ax], 2])
        else:
            shp_k.extend([k_new[ax], 1])
    kf = kpad.reshape(shp_k + [cin, cout])   # [ky,py, kx,px, kz,pz, c, o]
    kf = kf.transpose(0, 2, 4, 1, 3, 5, 6, 7)
    kf = kf.reshape(k_new[0], k_new[1], k_new[2], -1, cout)

    y = conv3d_direct(xp, kf, (1, 1, 1), "VALID",
                      preferred_element_type=preferred_element_type)
    return y[:, :out_sizes[0], :out_sizes[1], :out_sizes[2], :]


def conv3d_fc(x, kernel, preferred_element_type=None):
    """VALID conv whose kernel extent equals the input extent == one matmul.

    x: [N, h, w, d, Cin], kernel: [h, w, d, Cin, Cout] -> [N, 1, 1, 1, Cout].
    The classifier head's pool-cube conv (7^3 VALID over a 7^3 input,
    reference core/models.py:5697-5709) is this case: XLA:TPU schedules it
    as a convolution at ~2.5 TFLOP/s, while the equivalent
    [N, h*w*d*Cin] x [h*w*d*Cin, Cout] contraction runs on the MXU at
    near-peak (scripts/bench_fcconv.py). Accumulates in f32, rounds once.
    """
    n = x.shape[0]
    acc = preferred_element_type or jnp.float32
    y = lax.dot_general(
        x.reshape(n, -1), kernel.reshape(-1, kernel.shape[-1]),
        (((1,), (0,)), ((), ())), preferred_element_type=acc)
    y = y.astype(preferred_element_type or x.dtype)
    return y.reshape(n, 1, 1, 1, kernel.shape[-1])


def conv3d(x, kernel, strides=(1, 1, 1), padding="SAME",
           kernel_dilation=(1, 1, 1), preferred_element_type=None):
    """Dispatching 3D conv: kz-decomposed on TPU for large-spatial shapes.

    v5e measurements (bf16, chained-scan timing): decomposition wins when
    the folded 2D conv has a big spatial extent — 4.6x at (64,64,12)
    c256->512, 1.2x at 32^3 — but LOSES on the small-spatial ROI-head
    stacks where the 2D conv degenerates (0.6x at 14^3 x 200 ROIs, 0.7x on
    the 7^3 VALID classifier conv). H*W >= 1024 is the empirical
    crossover. Full-extent VALID convs (the classifier pool-cube conv) are
    exactly one matmul — always dispatched to conv3d_fc.
    """
    kd = kernel.shape[2]
    if (isinstance(padding, str) and padding.upper() == "VALID"
            and tuple(kernel.shape[:3]) == tuple(x.shape[1:4])
            and tuple(strides) == (1, 1, 1)
            and tuple(kernel_dilation) == (1, 1, 1)):
        return conv3d_fc(x, kernel, preferred_element_type)
    if (kd > 1 and x.shape[1] * x.shape[2] >= 1024
            and jax.default_backend() not in ("cpu",)):
        return conv3d_zdec(x, kernel, strides, padding, kernel_dilation,
                           preferred_element_type)
    return conv3d_direct(x, kernel, strides, padding, kernel_dilation,
                         preferred_element_type)


class ZConv(nn.Module):
    """Drop-in nn.Conv replacement using the dispatching conv3d.

    Parameter names/shapes identical to nn.Conv (kernel [kh,kw,kd,Cin,Cout],
    bias [Cout]) — checkpoints are interchangeable.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kh, kw, kd = (int(k) for k in self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, kd, cin, self.features),
                            self.param_dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # conv3d_zdec sums its per-kz partials in f32 internally (see
        # conv3d_zdec), so bf16 inputs don't accumulate partial-sum drift.
        y = conv3d(x, kernel, self.strides, self.padding,
                   self.kernel_dilation)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y

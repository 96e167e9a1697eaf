"""3D Feature Pyramid Network (flax).

Parity with the reference's inline FPN (core/models.py:3190-3214): P5 from C5
via 1^3 conv, top-down pathway with (2,2,1) upsampling + 1^3 lateral convs,
3^3 smoothing convs, P6 = stride-(2,2,1) subsample of P5.

Deliberate fix vs the reference: the P6 pooling stride derives from
``BACKBONE_STRIDES[4] / BACKBONE_STRIDES[3]`` so the anchor grid and the
network always agree (the reference hardcodes (2,2,1) while the default
config declares (64,64,2), a latent mismatch its training path papers over
by forcing z-strides to 1 — core/models.py:3403-3419).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from m3d.ops.conv3d import ZConv

Dtype = Any


def _upsample(x, factors):
    """Nearest-neighbor upsampling by integer factors (UpSampling3D parity)."""
    for axis, f in zip((1, 2, 3), factors):
        if f > 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


class FPN3D(nn.Module):
    channels: int = 256
    p6_stride: tuple[int, int, int] = (2, 2, 1)
    dtype: Dtype = jnp.bfloat16
    # Top-down upsample factors (P5->P4, P4->P3, P3->P2) = consecutive
    # BACKBONE_STRIDES ratios; (2,2,1) matches the reference's hardcoded
    # UpSampling3D, z-strided/isotropic pyramids get their true factors.
    upsample_factors: tuple = ((2, 2, 1), (2, 2, 1), (2, 2, 1))

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        conv1 = lambda n: nn.Conv(self.channels, (1, 1, 1), dtype=self.dtype, name=n)  # noqa: E731
        conv3 = lambda n: ZConv(self.channels, (3, 3, 3), padding="SAME",  # noqa: E731
                                dtype=self.dtype, name=n)
        f54, f43, f32 = self.upsample_factors

        def up_to(x, factors, ref):
            # ceil-division level shapes can leave the upsampled map one
            # voxel larger than the lateral on non-divisible dims; crop.
            x = _upsample(x, factors)
            return x[:, : ref.shape[1], : ref.shape[2], : ref.shape[3], :]

        p5 = conv1("fpn_c5p5")(c5)
        p4 = up_to(p5, f54, c4) + conv1("fpn_c4p4")(c4)
        p3 = up_to(p4, f43, c3) + conv1("fpn_c3p3")(c3)
        p2 = up_to(p3, f32, c2) + conv1("fpn_c2p2")(c2)

        p2 = conv3("fpn_p2")(p2)
        p3 = conv3("fpn_p3")(p3)
        p4 = conv3("fpn_p4")(p4)
        p5 = conv3("fpn_p5")(p5)
        # P6: pool_size (1,1,1) stride s == strided subsample.
        sy, sx, sz = self.p6_stride
        p6 = p5[:, ::sy, ::sx, ::sz, :]
        return p2, p3, p4, p5, p6

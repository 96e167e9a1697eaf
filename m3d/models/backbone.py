"""3D ResNet backbone (flax), TPU-first.

Architecture parity with the reference (core/models.py:157-273): Conv3D stem
7^3 stride (2,2,1), maxpool 3^3 stride (2,2,1), four bottleneck stages with
XY-stride 2 / Z-stride 1 — depth resolution is preserved through the trunk
for anisotropic microscopy volumes. resnet50 = 5 / resnet101 = 22 identity
blocks in stage 4.

TPU design notes:
- channels-last [B, H, W, D, C]; convs land on the MXU via XLA.
- ``dtype`` controls activation/compute precision (bfloat16 by default on
  TPU); parameters stay float32.
- BatchNorm runs in inference mode (running stats) unless ``train_bn`` —
  matching the reference's frozen-BN discipline for tiny batches
  (core/models.py:102-114, config TRAIN_BN=False).
- Module names mirror the reference layer names (res2a_branch2a, bn_conv1, …)
  so checkpoints are name-keyed compatibly for partial restore.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from m3d.ops.conv3d import ZConv

Dtype = Any


class BNRelu(nn.Module):
    """BatchNorm (+ optional relu). Frozen unless train_bn."""

    name_bn: str
    train_bn: bool = False
    relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(
            use_running_average=not self.train_bn,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=self.name_bn,
        )(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """ResNet bottleneck; identity when strides == (1,1,1) and not conv_shortcut.

    Reference: identity_block (core/models.py:157-189) and conv_block
    (core/models.py:192-232).
    """

    filters: tuple[int, int, int]
    stage: int
    block: str
    strides: tuple[int, int, int] = (1, 1, 1)
    conv_shortcut: bool = False
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        f1, f2, f3 = self.filters
        cname = f"res{self.stage}{self.block}_branch"
        bname = f"bn{self.stage}{self.block}_branch"
        conv = lambda f, k, s, n, p="SAME": ZConv(  # noqa: E731
            f, (k, k, k), strides=s, padding=p, dtype=self.dtype, name=n
        )

        y = conv(f1, 1, self.strides, cname + "2a", "VALID")(x)
        y = BNRelu(name_bn=bname + "2a", train_bn=self.train_bn, dtype=self.dtype)(y)
        y = conv(f2, 3, (1, 1, 1), cname + "2b")(y)
        y = BNRelu(name_bn=bname + "2b", train_bn=self.train_bn, dtype=self.dtype)(y)
        y = conv(f3, 1, (1, 1, 1), cname + "2c", "VALID")(y)
        y = BNRelu(name_bn=bname + "2c", train_bn=self.train_bn, relu=False,
                   dtype=self.dtype)(y)

        if self.conv_shortcut:
            sc = conv(f3, 1, self.strides, cname + "1", "VALID")(x)
            sc = BNRelu(name_bn=bname + "1", train_bn=self.train_bn, relu=False,
                        dtype=self.dtype)(sc)
        else:
            sc = x
        return nn.relu(y + sc)


def stage_strides(level_strides):
    """Per-stage (stem conv, stem pool, C3, C4, C5) strides from the config's
    cumulative per-level BACKBONE_STRIDES (first four levels = C2..C5).

    The reference network hardcodes z-stride 1 and *forces* the config to
    match at train time (core/models.py:3403-3419), which silently breaks
    its own z-strided configs (hela BACKBONE_STRIDES z=2). Here the trunk
    genuinely honors per-axis strides so the anchor grid derived from the
    config always matches the network — including isotropic (s,s,s) stride
    pyramids for deep isotropic volumes.
    """
    s = [tuple(int(v) for v in lv) for lv in level_strides[:4]]
    assert s[0][0] == s[0][1] == 4, (
        f"C2 must be at xy-stride 4 (stem conv 2 x pool 2), got {s[0]}"
    )
    z0 = s[0][2]
    assert z0 in (1, 2, 4), f"C2 z-stride must be 1, 2 or 4, got {z0}"
    stem_z = 2 if z0 >= 2 else 1
    pool_z = z0 // stem_z
    stages = []
    for i in (1, 2, 3):
        r = tuple(s[i][a] // s[i - 1][a] for a in range(3))
        assert all(f >= 1 and s[i][a] == s[i - 1][a] * f
                   for a, f in enumerate(r)), (
            f"BACKBONE_STRIDES must grow by integer per-axis factors; "
            f"level {i}: {s[i]} vs {s[i - 1]}"
        )
        stages.append(r)
    return (2, 2, stem_z), (2, 2, pool_z), *stages


class ResNet3D(nn.Module):
    """Returns (C1, C2, C3, C4, C5) feature maps.

    ``level_strides`` = the config's BACKBONE_STRIDES (cumulative, per level);
    the trunk derives true per-stage strides from it (see stage_strides)."""

    architecture: str = "resnet50"
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    level_strides: tuple = ((4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                            (64, 64, 1))

    @nn.compact
    def __call__(self, x):
        assert self.architecture in ("resnet50", "resnet101")
        x = jnp.asarray(x, self.dtype)
        stem_s, pool_s, s3, s4, s5 = stage_strides(self.level_strides)

        # Stage 1: pad 3, conv 7^3, bn, relu, maxpool.
        x = ZConv(64, (7, 7, 7), strides=stem_s,
                  padding=[(3, 3)] * 3, dtype=self.dtype, name="conv1")(x)
        x = BNRelu(name_bn="bn_conv1", train_bn=self.train_bn, dtype=self.dtype)(x)
        c1 = x = nn.max_pool(x, (3, 3, 3), strides=pool_s, padding="SAME")

        def stage(x, filters, stage_id, n_identity, first_strides):
            x = Bottleneck(filters, stage_id, "a", first_strides,
                           conv_shortcut=True, train_bn=self.train_bn,
                           dtype=self.dtype)(x)
            for i in range(n_identity):
                x = Bottleneck(filters, stage_id, chr(98 + i),
                               train_bn=self.train_bn, dtype=self.dtype)(x)
            return x

        c2 = x = stage(x, (64, 64, 256), 2, 2, (1, 1, 1))
        c3 = x = stage(x, (128, 128, 512), 3, 3, s3)
        n4 = {"resnet50": 5, "resnet101": 22}[self.architecture]
        c4 = x = stage(x, (256, 256, 1024), 4, n4, s4)
        c5 = stage(x, (512, 512, 2048), 5, 2, s5)
        return c1, c2, c3, c4, c5

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
        conv = lambda f, k, s, n, p="SAME": nn.Conv(  # noqa: E731
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


class ResNet3D(nn.Module):
    """Returns (C1, C2, C3, C4, C5) feature maps."""

    architecture: str = "resnet50"
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        assert self.architecture in ("resnet50", "resnet101")
        x = jnp.asarray(x, self.dtype)

        # Stage 1: pad 3, conv 7^3 stride (2,2,1), bn, relu, maxpool (2,2,1).
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 1),
                    padding=[(3, 3)] * 3, dtype=self.dtype, name="conv1")(x)
        x = BNRelu(name_bn="bn_conv1", train_bn=self.train_bn, dtype=self.dtype)(x)
        c1 = x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 1), padding="SAME")

        def stage(x, filters, stage_id, n_identity, first_strides):
            x = Bottleneck(filters, stage_id, "a", first_strides,
                           conv_shortcut=True, train_bn=self.train_bn,
                           dtype=self.dtype)(x)
            for i in range(n_identity):
                x = Bottleneck(filters, stage_id, chr(98 + i),
                               train_bn=self.train_bn, dtype=self.dtype)(x)
            return x

        c2 = x = stage(x, (64, 64, 256), 2, 2, (1, 1, 1))
        c3 = x = stage(x, (128, 128, 512), 3, 3, (2, 2, 1))
        n4 = {"resnet50": 5, "resnet101": 22}[self.architecture]
        c4 = x = stage(x, (256, 256, 1024), 4, n4, (2, 2, 1))
        c5 = stage(x, (512, 512, 2048), 5, 2, (2, 2, 1))
        return c1, c2, c3, c4, c5

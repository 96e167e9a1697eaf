"""RPN head (flax), shared across pyramid levels.

Parity with the reference (core/models.py:512-584): 3^3 conv 512 relu ->
1^3 conv 256 relu -> 1^3 class conv (2*apl) and 1^3 bbox conv (6*apl, init
std 0.001). Flattening to [B, A, 2]/[B, A, 6] is cell-major, anchor-minor —
the exact order of the anchor pyramid when each level carries one scale
(the reference implicitly requires n_scales == n_levels; we assert it at
model build, see m3d/models/mask_rcnn.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from m3d.ops.conv3d import ZConv

Dtype = Any


class RPNHead(nn.Module):
    anchors_per_location: int
    anchor_stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feature_map):
        k = self.anchors_per_location
        s = (self.anchor_stride,) * 3
        shared = nn.relu(
            ZConv(512, (3, 3, 3), strides=s, padding="SAME",
                  dtype=self.dtype, name="rpn_conv_shared1")(feature_map)
        )
        shared = nn.relu(
            nn.Conv(256, (1, 1, 1), dtype=self.dtype,
                    name="rpn_conv_shared2")(shared)
        )
        cls = nn.Conv(2 * k, (1, 1, 1), dtype=self.dtype,
                      name="rpn_class_raw")(shared)
        bbox = nn.Conv(
            6 * k, (1, 1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.001),
            name="rpn_bbox_pred",
        )(shared)

        b = feature_map.shape[0]
        logits = cls.reshape(b, -1, 2).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        deltas = bbox.reshape(b, -1, 6).astype(jnp.float32)
        return logits, probs, deltas

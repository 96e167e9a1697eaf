"""FPN classifier and mask heads (flax).

Parity with the reference head graphs (core/models.py:1121-1238):

ClassifierHead: pool^3 "FC" conv -> 1^3 conv (both + BN momentum 0.9 + relu)
-> class logits Dense with foreground-prior bias init
(-ln((1-0.15)/0.15)) and +-10 logit clip -> softmax; bbox Dense
``num_classes * 6``. The reference's MaxNorm kernel constraints are applied
as a post-optimizer-step projection (see m3d/train/optim.py) rather than a
layer property.

MaskHead: 4x 3^3 convs with a dilated-residual block (conv3b, dilation 2,
additive merge), 2x transpose-conv upsample, 1^3 sigmoid conv — output
[B, T, 2m, 2m, 2m, num_classes].

TimeDistributed is realized by folding the ROI axis into the batch axis —
free under XLA, no per-ROI loop.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from m3d.ops.conv3d import ZConv

Dtype = Any

FG_PRIOR = 0.15


def _class_bias_init(num_classes: int):
    bg = -np.log((1 - FG_PRIOR) / FG_PRIOR)
    fg = np.log(FG_PRIOR / (1 - FG_PRIOR))
    bias = np.full((num_classes,), fg, np.float32)
    bias[0] = bg

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (num_classes,)
        return jnp.asarray(bias, dtype)

    return init


class ClassifierHead(nn.Module):
    pool_size: int
    num_classes: int
    fc_layers_size: int = 1024
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, from_fc: bool = False):
        """x: [B, T, p, p, p, C] -> (logits [B,T,C], probs [B,T,C], bbox [B,T,C,6]).

        from_fc=True: ``x`` is [B, T, F] — the mrcnn_class_conv1 output
        (bias included) precomputed by the fused ROIAlign+FC kernel
        (roialign3d.pyramid_roi_align_fc); conv1 is skipped. Inference-only
        callers use this (MaskRCNN.classify_rois); init always takes the
        standard path so conv1 params exist either way."""
        b, t = x.shape[:2]
        p = self.pool_size
        if from_fc:
            x = x.reshape(b * t, 1, 1, 1, x.shape[-1]).astype(self.dtype)
        else:
            x = x.reshape(b * t, *x.shape[2:]).astype(self.dtype)
            x = ZConv(self.fc_layers_size, (p, p, p), padding="VALID",
                      dtype=self.dtype, name="mrcnn_class_conv1")(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn, momentum=0.9,
                         dtype=self.dtype, name="mrcnn_class_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.fc_layers_size, (1, 1, 1), dtype=self.dtype,
                    name="mrcnn_class_conv2")(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn, momentum=0.9,
                         dtype=self.dtype, name="mrcnn_class_bn2")(x)
        x = nn.relu(x)

        shared = x.reshape(b, t, self.fc_layers_size)

        logits = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=_class_bias_init(self.num_classes),
            dtype=jnp.float32,
            name="mrcnn_class_logits",
        )(shared.astype(jnp.float32))
        # Reference ±10 clip (core/models.py logit clipping) applied
        # straight-through: forward value is the clipped logit, but the
        # gradient passes as identity. A hard jnp.clip has ZERO gradient
        # outside the band, so one early large-LR step that pushes both
        # logits past -10 kills the classifier permanently (softmax sees
        # two equal clipped values; no gradient can ever pull them back) —
        # the e2e collapse ANISO.md documents. Straight-through keeps the
        # forward semantics identical while letting training recover.
        logits = logits + jax.lax.stop_gradient(
            jnp.clip(logits, -10.0, 10.0) - logits)
        probs = jax.nn.softmax(logits, axis=-1)

        bbox = nn.Dense(
            self.num_classes * 6,
            kernel_init=nn.initializers.normal(stddev=0.001),
            dtype=jnp.float32,
            name="mrcnn_bbox_fc",
        )(shared.astype(jnp.float32))
        bbox = bbox.reshape(b, t, self.num_classes, 6)
        return logits, probs, bbox


class MaskHead(nn.Module):
    num_classes: int
    conv_channel: int = 256
    train_bn: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: [B, T, m, m, m, C] -> masks [B, T, 2m, 2m, 2m, num_classes] (sigmoid)."""
        b, t = x.shape[:2]
        x = x.reshape(b * t, *x.shape[2:]).astype(self.dtype)
        cc = self.conv_channel

        def conv_bn_relu(x, name_c, name_b, dilation=1):
            x = ZConv(cc, (3, 3, 3), padding="SAME",
                      kernel_dilation=(dilation,) * 3,
                      dtype=self.dtype, name=name_c)(x)
            x = nn.BatchNorm(use_running_average=not self.train_bn,
                             dtype=self.dtype, name=name_b)(x)
            return nn.relu(x)

        x = conv_bn_relu(x, "mrcnn_mask_conv1", "mrcnn_mask_bn1")
        x = conv_bn_relu(x, "mrcnn_mask_conv2", "mrcnn_mask_bn2")
        res = conv_bn_relu(x, "mrcnn_mask_conv3", "mrcnn_mask_bn3")
        dil = conv_bn_relu(res, "mrcnn_mask_conv3b", "mrcnn_mask_bn3b", dilation=2)
        x = res + dil
        x = conv_bn_relu(x, "mrcnn_mask_conv4", "mrcnn_mask_bn4")

        x = nn.relu(
            nn.ConvTranspose(cc, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, name="mrcnn_mask_deconv")(x)
        )
        # Final 1^3 conv stays in the compute dtype: casting the post-deconv
        # activation to f32 materializes a [B*T, 28^3, C] f32 tensor (~4.5GB
        # at the 128^3 bench shape) purely for a 256->num_classes
        # contraction — ~10ms of pure HBM traffic. The MXU accumulates the
        # 1^3 conv in f32 regardless; only the logits go f32 for sigmoid.
        # Params remain f32 (param_dtype) — checkpoint layout unchanged.
        x = ZConv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                  name="mrcnn_mask")(x)
        x = jax.nn.sigmoid(x.astype(jnp.float32))
        return x.reshape(b, t, *x.shape[1:])

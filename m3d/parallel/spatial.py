"""Spatial-domain parallelism — sharding one volume across chips.

The reference scales volume size *offline*, by cutting microscopy stacks into
256x256x12 patches (prepocess.ipynb; configs/rpn/scp_rpn_rats.json) because a
single GPU must hold the whole activation volume. On TPU the idiomatic
equivalent of "context parallelism" for a ConvNet is spatial-domain sharding
(SURVEY.md §5.7): split the volume's Y axis across a ``space`` mesh axis for
the convolutional trunk, and let XLA GSPMD insert the halo exchanges
(ppermute collectives over ICI) that the 7^3/3^3 convolutions need at shard
boundaries. The ROI stages (proposal NMS, ROIAlign, heads) operate on global
coordinates over a few thousand boxes — tiny next to the trunk — so the
pyramid is all-gathered (once, P2..P6) and they run replicated.

This composes with data parallelism on a 2-D ``(data, space)`` mesh: batch
sharded over ``data``, Y over ``space``, params replicated, gradient psum
over both axes emitted by XLA inside the jitted train step.

Used by:
  - ``make_spatial_inference`` — full-inference forward for volumes larger
    than one chip's HBM budget.
  - ``spatial_extract_features`` — drop-in trunk forward for train steps.
  - ``__graft_entry__.dryrun_multichip`` — validates dp x sp compiles/runs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh_2d(n_data: int | None = None, n_space: int = 1, devices=None):
    """``(data, space)`` mesh. ``n_data`` defaults to ndev / n_space."""
    if devices is None:
        devices = jax.devices()
    n_space = max(1, int(n_space))
    if n_data is None:
        n_data = max(1, len(devices) // n_space)
    devices = np.asarray(devices[: n_data * n_space]).reshape(
        (n_data, n_space)
    )
    return Mesh(devices, (DATA_AXIS, SPACE_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, D, C]: batch over data, Y over space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _constrain(x, sharding):
    return jax.lax.with_sharding_constraint(x, sharding)


def spatial_extract_features(model, variables, image, mesh,
                             gather: bool = True, **apply_kw):
    """Backbone + FPN with the volume sharded over the ``space`` axis.

    The input constraint pins [B, H(sharded), W, D, C]; every conv in the
    trunk then runs on Y-shards with GSPMD halo exchange. With ``gather``
    the P2..P6 pyramid is re-assembled (all-gather over ``space``) for the
    globally-indexed ROI stages; pass ``gather=False`` to keep the pyramid
    sharded (e.g. RPN-only training, where the head convs and losses are
    pointwise in Y and never need the full volume on one chip).
    """
    image = _constrain(image, image_sharding(mesh))
    feats = model.apply(variables, image, method=type(model).extract_features,
                        **apply_kw)
    if gather:
        feats = tuple(_constrain(f, batch_only_sharding(mesh)) for f in feats)
    return feats


def make_spatial_inference(model, mesh, static_meta=None, static_anchors=None):
    """Full Mask R-CNN inference with a spatially-sharded trunk.

    Returns ``fn(variables, image[, image_meta, anchors])`` (jitted): trunk
    convolutions run Y-sharded over ``space``, the pyramid is gathered once,
    and proposal/ROIAlign/head stages run replicated. Mirrors
    ``MaskRCNN.__call__`` stage-for-stage.
    """
    import jax.numpy as jnp

    from m3d.ops.roialign3d import pyramid_roi_align

    cls = type(model)

    def forward(variables, image, image_meta, anchors):
        feats = spatial_extract_features(model, variables, image, mesh)
        logits, probs, deltas = model.apply(
            variables, feats, method=cls.rpn_forward)
        proposals, prop_valid = model.apply(
            variables, probs, deltas, anchors, method=cls.propose)
        mrcnn_feats = list(feats[:4])
        # The XLA ROIAlign (not the Pallas auto-dispatch): pallas_call is a
        # per-device kernel and doesn't partition under GSPMD; the gather
        # formulation shards/replicates like any other XLA op.
        aligned = pyramid_roi_align(proposals, image_meta, mrcnn_feats,
                                    model.pool_size)
        cls_logits, cls_probs, cls_bbox = model.apply(
            variables, aligned, method=lambda m, a: m.classifier(a))
        from m3d.models.detection import refine_detections_batch

        detections, det_valid = refine_detections_batch(
            proposals, cls_probs, cls_bbox, image_meta,
            jnp.asarray(model.bbox_std_dev, jnp.float32),
            model.detection_min_confidence,
            model.detection_nms_threshold,
            model.detection_max_instances,
            nms_xy_only=model.detection_nms_xy_only,
        )
        mask_aligned = pyramid_roi_align(detections[..., :6], image_meta,
                                         mrcnn_feats, model.mask_pool_size)
        masks = model.apply(
            variables, mask_aligned, method=lambda m, a: m.mask_head(a))
        return {
            "detections": detections,
            "detections_valid": det_valid,
            "mrcnn_masks": masks,
            "proposals": proposals,
            "proposals_valid": prop_valid,
        }

    if static_meta is not None and static_anchors is not None:
        jitted = jax.jit(
            lambda v, img: forward(v, img, static_meta, static_anchors)
        )
    else:
        jitted = jax.jit(forward)
    return jitted

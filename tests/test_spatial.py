"""Spatial-domain sharding (m3d/parallel/spatial.py) vs single-device oracle.

Runs on the 8-virtual-CPU-device mesh from conftest. The sharded trunk must
be numerically equivalent to the unsharded forward — GSPMD halo exchange is
an implementation detail, not a semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.models.mask_rcnn import MaskRCNN, init_params
from m3d.parallel.spatial import (
    make_mesh_2d,
    make_spatial_inference,
    spatial_extract_features,
)

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # multi-device GSPMD compiles take minutes on CPU
]


def _tiny():
    cfg = Config(
        IMAGE_SIZE=64, IMAGE_DEPTH=8,
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                          (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        PRE_NMS_LIMIT=512, POST_NMS_ROIS_INFERENCE=64,
        DETECTION_MAX_INSTANCES=8,
        FPN_CLASSIF_FC_LAYERS_SIZE=64, HEAD_CONV_CHANNEL=32,
        TOP_DOWN_PYRAMID_SIZE=32,
        COMPUTE_DTYPE="float32",  # exact cross-sharding comparison
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    variables = init_params(model, jax.random.PRNGKey(0))
    anchors = normalized_pyramid_anchors(cfg)
    meta = default_meta(cfg)[None]
    image = np.random.RandomState(1).randn(1, 64, 64, 8, 1).astype(np.float32)
    return cfg, model, variables, anchors, meta, image


def test_mesh_2d_layout():
    mesh = make_mesh_2d(n_data=2, n_space=4)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (2, 4)
    mesh = make_mesh_2d(n_space=8)
    assert mesh.devices.shape == (1, 8)


def test_spatial_trunk_matches_single_device():
    _, model, variables, _, _, image = _tiny()
    ref = jax.jit(
        lambda v, img: model.apply(v, img,
                                   method=MaskRCNN.extract_features)
    )(variables, image)

    mesh = make_mesh_2d(n_space=8)
    sharded = jax.jit(
        lambda v, img: spatial_extract_features(model, v, img, mesh)
    )(variables, image)

    for r, s in zip(ref, sharded):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(s, np.float32),
            rtol=1e-4, atol=1e-4,
        )


def test_spatial_inference_matches_single_device():
    _, model, variables, anchors, meta, image = _tiny()
    ref = jax.jit(
        lambda v, img: model.apply(v, img, meta, anchors)
    )(variables, image)

    mesh = make_mesh_2d(n_data=1, n_space=4)
    fn = make_spatial_inference(model, mesh, static_meta=meta,
                                static_anchors=anchors)
    out = fn(variables, image)

    np.testing.assert_allclose(
        np.asarray(ref["detections"], np.float32),
        np.asarray(out["detections"], np.float32),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ref["mrcnn_masks"], np.float32),
        np.asarray(out["mrcnn_masks"], np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_spatial_with_data_parallel_batch():
    """dp x sp on one jitted trunk: batch 2 over data=2, Y over space=4."""
    _, model, variables, _, _, image = _tiny()
    image2 = np.concatenate([image, image[:, ::-1]], axis=0)

    ref = jax.jit(
        lambda v, img: model.apply(v, img,
                                   method=MaskRCNN.extract_features)
    )(variables, image2)

    mesh = make_mesh_2d(n_data=2, n_space=4)
    sharded = jax.jit(
        lambda v, img: spatial_extract_features(model, v, img, mesh)
    )(variables, image2)

    for r, s in zip(ref, sharded):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(s, np.float32),
            rtol=1e-4, atol=1e-4,
        )

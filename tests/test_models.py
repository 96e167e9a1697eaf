"""Model stack: shapes, anchor alignment, full inference forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.models.mask_rcnn import MaskRCNN


def tiny_config(**kw):
    base = dict(
        IMAGE_SIZE=64,
        IMAGE_DEPTH=8,
        NUM_CLASSES=2,
        BACKBONE="resnet50",
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1), (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 16, 24, 32, 48),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        PRE_NMS_LIMIT=512,
        POST_NMS_ROIS_INFERENCE=64,
        POST_NMS_ROIS_TRAINING=64,
        DETECTION_MAX_INSTANCES=8,
        POOL_SIZE=7,
        MASK_POOL_SIZE=14,
        FPN_CLASSIF_FC_LAYERS_SIZE=64,
        HEAD_CONV_CHANNEL=32,
        TOP_DOWN_PYRAMID_SIZE=32,
        COMPUTE_DTYPE="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def built():
    cfg = tiny_config()
    model = MaskRCNN.from_config(cfg, mode="inference")
    image = np.zeros((1, 64, 64, 8, 1), np.float32)
    anchors = normalized_pyramid_anchors(cfg)
    meta = default_meta(cfg)[None]
    variables = model.init(jax.random.PRNGKey(0), image, meta, anchors)
    return cfg, model, variables, image, anchors, meta


def test_feature_pyramid_shapes(built):
    cfg, model, variables, image, anchors, meta = built
    feats = model.apply(variables, image, method=MaskRCNN.extract_features)
    shapes = [f.shape for f in feats]
    assert shapes[0] == (1, 16, 16, 8, 32)  # P2
    assert shapes[1] == (1, 8, 8, 8, 32)    # P3
    assert shapes[2] == (1, 4, 4, 8, 32)    # P4
    assert shapes[3] == (1, 2, 2, 8, 32)    # P5
    assert shapes[4] == (1, 1, 1, 8, 32)    # P6


def test_rpn_output_aligns_with_anchor_pyramid(built):
    cfg, model, variables, image, anchors, meta = built

    def fwd(mdl, image):
        feats = mdl.extract_features(image)
        return mdl.rpn_forward(feats)

    logits, probs, deltas = model.apply(variables, image, method=fwd)
    assert logits.shape == (1, anchors.shape[0], 2)
    assert deltas.shape == (1, anchors.shape[0], 6)
    # softmax normalized
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_full_inference_forward(built):
    cfg, model, variables, image, anchors, meta = built
    out = model.apply(variables, image, meta, anchors)
    assert out["detections"].shape == (1, 8, 8)
    assert out["mrcnn_masks"].shape == (1, 8, 28, 28, 28, 2)
    assert out["proposals"].shape == (1, 64, 6)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v, np.float32)).all()


def test_inference_jits_and_is_deterministic(built):
    cfg, model, variables, image, anchors, meta = built

    @jax.jit
    def run(img):
        return model.apply(variables, img, meta, anchors)["detections"]

    a = np.asarray(run(image))
    b = np.asarray(run(image))
    np.testing.assert_array_equal(a, b)


def test_param_names_are_reference_keyed(built):
    cfg, model, variables, image, anchors, meta = built
    params = variables["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    # Spot-check reference layer names survive in the param tree
    assert any("conv1" in n and "resnet" in n for n in names)
    assert any("fpn_c5p5" in n for n in names)
    assert any("rpn_conv_shared1" in n for n in names)
    assert any("mrcnn_class_logits" in n for n in names)
    assert any("mrcnn_mask_deconv" in n for n in names)

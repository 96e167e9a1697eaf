"""Serving bundles (m3d/serve.py): export -> load -> predict round trip.

The exported StableHLO graph must reproduce the in-process inference graph
exactly, reject wrong-shape inputs, and carry a manifest that rebuilds the
calling convention without the model code.
"""

import numpy as np
import pytest

import jax

# Export traces + multi-platform-lowers the full inference graph (~1 min);
# the fast tier's <5 min budget has no room for it.
pytestmark = pytest.mark.slow

from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.image_meta import default_meta
from m3d.models.mask_rcnn import MaskRCNN
from m3d.serve import (ServingBundle, ServingRouter, export_bucketed,
                       export_bundle)


def tiny_config():
    return Config(
        IMAGE_SIZE=64,
        IMAGE_DEPTH=8,
        NUM_CLASSES=2,
        BACKBONE="resnet50",
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                          (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 16, 24, 32, 48),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        PRE_NMS_LIMIT=512,
        POST_NMS_ROIS_INFERENCE=64,
        DETECTION_MAX_INSTANCES=8,
        DETECTION_MIN_CONFIDENCE=0.01,
        POOL_SIZE=7,
        MASK_POOL_SIZE=14,
        FPN_CLASSIF_FC_LAYERS_SIZE=64,
        HEAD_CONV_CHANNEL=32,
        TOP_DOWN_PYRAMID_SIZE=32,
        COMPUTE_DTYPE="float32",
    )


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    cfg = tiny_config()
    model = MaskRCNN.from_config(cfg, mode="inference")
    image = np.random.RandomState(3).randn(2, 64, 64, 8, 1).astype(np.float32)
    anchors = normalized_pyramid_anchors(cfg)
    meta = np.tile(default_meta(cfg)[None], (2, 1))
    variables = model.init(jax.random.PRNGKey(0), image[:1], meta[:1],
                           anchors)
    out_dir = str(tmp_path_factory.mktemp("bundle"))
    # Multi-platform lowering: the same artifact must serve CPU and TPU.
    manifest = export_bundle(cfg, variables, out_dir, batch=2,
                             platforms=("cpu", "tpu"))
    return cfg, model, variables, image, meta, anchors, out_dir, manifest


def test_export_and_load(bundle_dir):
    cfg, _model, _vars, image, _meta, _anchors, out_dir, manifest = bundle_dir
    assert manifest["format"] == "m3d-serving-bundle-v1"
    assert manifest["image_shape"] == [64, 64, 8, 1]
    assert manifest["platforms"] == ["cpu", "tpu"]
    # POST_NMS 64 / max-instances 8 are below the adaptive thresholds: the
    # bundle bakes the monolithic graph.
    assert manifest["chunks"] == {"classifier": None, "mask": None}

    loaded = ServingBundle.load(out_dir)
    assert loaded.manifest["batch"] == 2
    assert loaded.default_meta().shape == (2, cfg.IMAGE_META_SIZE)
    # Shape guard fires BEFORE any device work.
    with pytest.raises(ValueError, match="shape-frozen"):
        loaded.predict(image[:1])
    with pytest.raises(ValueError, match="shape-frozen"):
        loaded.predict(np.zeros((2, 64, 64, 16, 1), np.float32))


def test_sharded_export_matches_single_device(bundle_dir, tmp_path):
    """Data-parallel bundle: batch sharded over the 8-device CPU mesh must
    reproduce the single-device graph bit-for-bat... well, to fp tolerance
    (per-image pipeline; weights replicated, no cross-image coupling in the
    monolithic graph the dp export bakes)."""
    cfg, model, variables, image, _meta, anchors, _dir, _ = bundle_dir
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    out_dir = str(tmp_path / "bundle_dp")
    manifest = export_bundle(cfg, variables, out_dir, batch=8,
                             platforms=("cpu",), data_parallel=8)
    assert manifest["data_parallel"] == 8
    # dp exports default to the per-image monolithic graph (the compacted
    # stages would couple shards).
    assert manifest["chunks"] == {"classifier": None, "mask": None}

    loaded = ServingBundle.load(out_dir)
    image8 = np.concatenate([image] * 4, axis=0)
    out = loaded.predict(image8)

    from m3d.image_meta import default_meta as dm
    meta8 = np.tile(dm(cfg)[None], (8, 1))
    full = jax.device_get(model.apply(variables, image8, meta8, anchors))
    np.testing.assert_array_equal(out["detections_valid"],
                                  np.asarray(full["detections_valid"]))
    np.testing.assert_allclose(out["detections"],
                               np.asarray(full["detections"]),
                               rtol=1e-4, atol=1e-5)


def test_bucketed_router_variable_sizes(bundle_dir, tmp_path):
    """export_bucketed collapses shapes into compile buckets; the router
    pads a raw volume up to its bucket, carries the true extent in the meta
    window, and reproduces the in-process graph on the padded input."""
    cfg, model, variables, _image, _meta, anchors, _dir, _ = bundle_dir
    out_dir = str(tmp_path / "router")
    router_manifest = export_bucketed(
        cfg, variables, out_dir,
        volume_shapes=[(48, 48, 6), (64, 64, 8), (40, 62, 8)],
        batch=1, platforms=("cpu",))
    # All three raw shapes round up to ONE 64x64x8 bucket -> one export.
    assert list(router_manifest["buckets"]) == ["64x64x8"]

    # ONE weights copy at router level; sub-bundles reference it.
    import os
    assert os.path.exists(os.path.join(out_dir, "weights.msgpack"))
    sub = os.path.join(out_dir, "bucket_64x64x8")
    assert not os.path.exists(os.path.join(sub, "weights.msgpack"))
    with open(os.path.join(sub, "manifest.json")) as f:
        import json
        assert json.load(f)["weights_file"] == os.path.join(
            "..", "weights.msgpack")

    router = ServingRouter.load(out_dir)
    vol = np.random.RandomState(11).randn(48, 48, 6).astype(np.float32)
    out, meta = router.predict_volume(vol)
    assert out["detections"].shape[0] == 1
    np.testing.assert_array_equal(meta[9:15], [0, 0, 0, 48, 48, 6])

    padded = np.pad(vol, [(0, 16), (0, 16), (0, 2)])[None, ..., None]
    full = jax.device_get(
        model.apply(variables, padded, meta[None], anchors))
    np.testing.assert_array_equal(out["detections_valid"],
                                  np.asarray(full["detections_valid"]))
    np.testing.assert_allclose(out["detections"],
                               np.asarray(full["detections"]),
                               rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="no bundle for bucket"):
        router.predict_volume(np.zeros((128, 128, 8), np.float32))

    # Full product postprocess: label volume at the RAW (unpadded) shape,
    # instances consistent across outputs.
    seg = router.segment_volume(vol)
    assert seg["label_volume"].shape == (48, 48, 6)
    assert seg["label_volume"].dtype == np.uint16
    k = seg["masks"].shape[-1]
    assert seg["boxes_px"].shape == (k, 6)
    assert set(np.unique(seg["label_volume"])) <= set(range(k + 1))


def test_predict_matches_inprocess(bundle_dir):
    cfg, model, variables, image, meta, anchors, out_dir, _ = bundle_dir
    loaded = ServingBundle.load(out_dir)
    out = loaded.predict(image)
    full = jax.device_get(model.apply(variables, image, meta, anchors))
    np.testing.assert_array_equal(out["detections_valid"],
                                  np.asarray(full["detections_valid"]))
    np.testing.assert_allclose(out["detections"],
                               np.asarray(full["detections"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["mrcnn_masks"],
                               np.asarray(full["mrcnn_masks"]),
                               rtol=1e-4, atol=1e-5)
    assert np.asarray(full["detections_valid"]).sum() > 0

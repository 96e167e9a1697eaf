"""Golden numeric parity: m3d's jitted inference vs the pure-numpy reference
twin (m3d/utils/reference_twin.py).

The TF1/Keras-2 reference cannot execute in this container, so BASELINE.md's
">= 0.99 mask IoU vs reference" bar is discharged against an independent
numpy re-derivation of the reference's post-backbone inference graph
(reference: core/models.py:369-687, 1121-1238, 1415-1529, 5695-5740). Both
sides consume the SAME fixed-seed weights; the twin shares no jax code with
m3d, so agreement pins the graph semantics, not shared implementation bugs.

Structure: each stage is compared on IDENTICAL inputs (the upstream m3d
output is handed to the twin stage). A single end-to-end diff would test
chaos, not semantics — under random fixture weights candidate scores sit
within ~1e-3 of each other, so fp32 reduction-order noise (~1e-6) legally
reorders top-k/NMS picks downstream. The handoff composition covers exactly
the full inference cascade: RPN head -> ProposalLayer -> PyramidROIAlign ->
classifier -> refine_detections -> ROIAlign -> mask head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3d.anchors import normalized_pyramid_anchors
from m3d.image_meta import default_meta
from m3d.models.mask_rcnn import MaskRCNN, init_params
from m3d.utils import reference_twin as twin
from tests.test_train_smoke import tiny_train_config

pytestmark = pytest.mark.slow  # full inference graph compile (~minutes, CPU)


def _perturb_batch_stats(stats, key):
    """Randomize BN running stats so inference BN is non-trivial (frozen-BN
    discipline means these flow straight into the forward math)."""
    leaves, treedef = jax.tree_util.tree_flatten(stats)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        noise = jax.random.normal(k, leaf.shape, jnp.float32)
        out.append(jnp.abs(leaf + 0.25 * noise) + 0.05)  # keep var positive
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module", params=["iso", "aniso"])
def fixture(request):
    """Two golden fixtures: the isotropic 64x64x8 shape and an anisotropic
    one with a z-stride-2 pyramid + VOXEL_Z_OVER_Y anchors (the rats/HeLa
    regime shape discipline, reference configs/rpn/scp_rpn_hela.json,
    core/utils.py:1026-1142)."""
    aniso = request.param == "aniso"
    extra = dict(
        IMAGE_DEPTH=16,
        BACKBONE_STRIDES=[(4, 4, 2), (8, 8, 2), (16, 16, 2), (32, 32, 2),
                          (64, 64, 2)],
        VOXEL_Z_OVER_Y=4.0,
    ) if aniso else {}
    cfg = tiny_train_config(
        "/tmp/golden_unused",
        COMPUTE_DTYPE="float32",
        DETECTION_NMS_XY_ONLY=True,   # exact reference 2-D footprint NMS
        DETECTION_MIN_CONFIDENCE=0.05,
        DETECTION_MAX_INSTANCES=8,
        DETECTION_NMS_THRESHOLD=0.4,
        POST_NMS_ROIS_INFERENCE=64,
        PRE_NMS_LIMIT=256,
        MODE="inference",
        **extra,
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    key = jax.random.PRNGKey(20260820)
    variables = init_params(model, key, channels=1)
    variables = dict(variables)
    variables["batch_stats"] = _perturb_batch_stats(
        variables.get("batch_stats", {}), jax.random.PRNGKey(7))
    # Spread the near-prior logits so detection scores are well separated.
    params = variables["params"]
    for name in ("mrcnn_class_logits", "mrcnn_bbox_fc"):
        params["classifier"][name]["kernel"] = (
            params["classifier"][name]["kernel"] * 40.0)

    image = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, int(cfg.IMAGE_SIZE), int(cfg.IMAGE_SIZE),
         int(cfg.IMAGE_DEPTH), 1), jnp.float32)
    meta = np.stack([default_meta(cfg)])
    anchors = np.asarray(normalized_pyramid_anchors(
        cfg, voxel_z_over_y=float(getattr(cfg, "VOXEL_Z_OVER_Y", 1.0))),
        np.float32)

    out = jax.device_get(jax.jit(
        lambda v, im, mt, an: model.apply(v, im, mt, an)
    )(variables, image, jnp.asarray(meta), jnp.asarray(anchors)))

    feats = [np.asarray(f, np.float32) for f in jax.device_get(
        model.apply(variables, image, method=MaskRCNN.extract_features))]
    params_np = jax.device_get(variables["params"])
    stats_np = jax.device_get(variables["batch_stats"])
    return cfg, out, feats, params_np, stats_np, anchors, meta, \
        np.asarray(image, np.float32)


def test_rpn_and_proposals_match(fixture):
    """RPN head + ProposalLayer parity from shared feature maps: same kept
    boxes, same score order, same zero padding (core/models.py:369-584)."""
    cfg, out, feats, params, stats, anchors, meta, _img = fixture
    _, probs, deltas = twin.rpn_head_np([f for f in feats], params["rpn"])
    ref_props = twin.proposal_layer_np(
        probs[0], deltas[0], anchors, cfg.RPN_BBOX_STD_DEV,
        int(cfg.POST_NMS_ROIS_INFERENCE), float(cfg.RPN_NMS_THRESHOLD),
        int(cfg.PRE_NMS_LIMIT), int(cfg.IMAGE_DEPTH))
    live = np.abs(ref_props).sum(axis=1) > 0
    assert live.sum() > 4, "fixture degenerate: almost no proposals survived"
    np.testing.assert_allclose(np.asarray(out["proposals"][0]), ref_props,
                               atol=2e-4)


def test_classifier_match(fixture):
    """PyramidROIAlign + fpn_classifier_graph parity on m3d's proposals
    (core/models.py:597-688, 1121-1189)."""
    cfg, out, feats, params, stats, anchors, meta, _img = fixture
    props = np.asarray(out["proposals"][0])
    pooled = twin.pyramid_roi_align_np(
        props, meta[0, 5:8], [f[0] for f in feats[:4]], int(cfg.POOL_SIZE))
    _, probs_t, bbox_t = twin.classifier_head_np(
        pooled, params["classifier"], stats["classifier"],
        int(cfg.NUM_CLASSES))
    np.testing.assert_allclose(np.asarray(out["mrcnn_probs"][0]), probs_t,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["mrcnn_bbox"][0]), bbox_t,
                               atol=1e-4)


def test_detections_match(fixture):
    """refine_detections parity on m3d's classifier outputs: same boxes,
    same order, same count (core/models.py:1415-1529, incl. the 2-D
    footprint NMS quirk)."""
    cfg, out, feats, params, stats, anchors, meta, _img = fixture
    det_ref, valid_ref = twin.refine_detections_np(
        np.asarray(out["proposals"][0]),
        np.asarray(out["mrcnn_probs"][0]),
        np.asarray(out["mrcnn_bbox"][0]),
        meta[0, 5:8], cfg.BBOX_STD_DEV,
        float(cfg.DETECTION_MIN_CONFIDENCE),
        float(cfg.DETECTION_NMS_THRESHOLD),
        int(cfg.DETECTION_MAX_INSTANCES), nms_xy_only=True)
    assert valid_ref.sum() > 0, "fixture yields no detections"
    assert np.asarray(out["detections_valid"][0]).sum() == valid_ref.sum()
    np.testing.assert_allclose(np.asarray(out["detections"][0]), det_ref,
                               atol=1e-5)


def test_masks_match(fixture):
    """ROIAlign + mask head parity on m3d's detections: sigmoid outputs to
    ~5e-4 and thresholded-mask IoU >= 0.99 — the BASELINE.md golden bar
    (core/models.py:1191-1238)."""
    cfg, out, feats, params, stats, anchors, meta, _img = fixture
    det = np.asarray(out["detections"][0])
    valid = np.asarray(out["detections_valid"][0])
    n = int(valid.sum())
    assert n > 0

    pooled = twin.pyramid_roi_align_np(
        det[:n, :6], meta[0, 5:8], [f[0] for f in feats[:4]],
        int(cfg.MASK_POOL_SIZE))
    ref_masks = twin.mask_head_np(pooled, params["mask_head"],
                                  stats["mask_head"])
    m3d_masks = np.asarray(out["mrcnn_masks"][0][:n], np.float32)

    np.testing.assert_allclose(m3d_masks, ref_masks, atol=5e-4)

    a = m3d_masks >= 0.5
    b = ref_masks >= 0.5
    union = np.logical_or(a, b).sum()
    iou = np.logical_and(a, b).sum() / max(union, 1)
    if union:
        assert iou >= 0.99, f"thresholded mask IoU {iou:.4f} < 0.99"


def test_backbone_fpn_match(fixture):
    """Raw image -> P2..P6 parity: the numpy twin's resnet_graph + FPN
    (strided stem, bottleneck stages, top-down pathway, P6 subsample) must
    reproduce m3d's extract_features (reference core/models.py:157-273,
    3190-3214). With test_rpn_and_proposals_match onward, the golden chain
    now covers the inference graph from raw voxels to masks."""
    cfg, out, feats, params, stats, anchors, meta, img = fixture
    ref_feats = twin.twin_backbone_fpn(img, params, stats, cfg)
    assert len(ref_feats) == len(feats) == 5
    for lvl, (got, want) in enumerate(zip(feats, ref_feats)):
        assert got.shape == want.shape, (lvl, got.shape, want.shape)
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, atol=2e-3 * scale, rtol=1e-3,
            err_msg=f"P{lvl + 2}")

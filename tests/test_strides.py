"""Per-axis BACKBONE_STRIDES are honored by the trunk (regression).

The reference hardcodes z-stride 1 in its conv blocks and silently *forces*
z-strides to 1 at train time (core/models.py:3403-3419), which breaks its own
z-strided configs: the anchor grid (config-derived) and the RPN output grid
(network-derived) disagree, and gather-clamping hides the misalignment. m3d
derives true per-stage strides from BACKBONE_STRIDES (m3d/models/backbone.py
stage_strides), so every stride family — z=1 (rats), z=2 (HeLa), isotropic
(deep synthetic volumes) — has network == config == anchors.
"""

import jax
import numpy as np
import pytest

from m3d.anchors import normalized_pyramid_anchors
from m3d.config import Config
from m3d.models.backbone import stage_strides
from m3d.models.mask_rcnn import MaskRCNN, init_params

FAMILIES = {
    "rats-z1": (64, 12, [(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                         (64, 64, 1)]),
    "hela-z2": (64, 12, [(4, 4, 2), (8, 8, 2), (16, 16, 2), (32, 32, 2),
                         (64, 64, 2)]),
    "isotropic": (64, 64, [(4, 4, 4), (8, 8, 8), (16, 16, 16),
                           (32, 32, 32), (64, 64, 64)]),
}


def test_stage_strides_decomposition():
    stem, pool, s3, s4, s5 = stage_strides(FAMILIES["isotropic"][2])
    assert stem == (2, 2, 2) and pool == (2, 2, 2)
    assert s3 == s4 == s5 == (2, 2, 2)
    stem, pool, s3, s4, s5 = stage_strides(FAMILIES["hela-z2"][2])
    assert stem == (2, 2, 2) and pool == (2, 2, 1)
    assert s3 == s4 == s5 == (2, 2, 1)
    with pytest.raises(AssertionError):
        # z 2 -> 3 is not an integer per-axis growth factor
        stage_strides([(4, 4, 2), (8, 8, 3), (16, 16, 3), (32, 32, 3),
                       (64, 64, 3)])


@pytest.mark.parametrize("family", sorted(FAMILIES))
@pytest.mark.slow  # builds and runs a real trunk per stride family
def test_network_grid_matches_config_and_anchors(family):
    size, depth, strides = FAMILIES[family]
    cfg = Config(
        IMAGE_SIZE=size, IMAGE_DEPTH=depth, BACKBONE_STRIDES=strides,
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32), RPN_ANCHOR_RATIOS=[0.5, 1.0],
        TOP_DOWN_PYRAMID_SIZE=16, FPN_CLASSIF_FC_LAYERS_SIZE=16,
        HEAD_CONV_CHANNEL=16,
    )
    model = MaskRCNN.from_config(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    image = np.zeros((1, size, size, depth, 1), np.float32)
    feats = model.apply(variables, image, method=MaskRCNN.extract_features)

    want = [tuple(int(v) for v in s)
            for s in cfg.backbone_shapes([size, size, depth, 1])]
    got = [f.shape[1:4] for f in feats]
    assert got[:4] == want[:4], f"{family}: network {got} != config {want}"

    anchors = normalized_pyramid_anchors(cfg)
    _, probs, _ = model.apply(variables, feats, method=MaskRCNN.rpn_forward)
    assert anchors.shape[0] == probs.shape[1], (
        f"{family}: {anchors.shape[0]} anchors vs {probs.shape[1]} RPN "
        f"positions"
    )

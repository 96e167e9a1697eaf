"""Keras-H5 checkpoint interop (m3d/utils/h5_import.py).

Round-trips an m3d variables tree through the reference's H5 weight format
and back, exercising the same surgery paths the reference uses: by-name
merge across model variants, class-dim slicing, kernel-shape introspection
(core/models.py:4924-5338).
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
from flax import traverse_util  # noqa: E402

from m3d.config import Config  # noqa: E402
from m3d.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402
from m3d.train.checkpoints import load_params, restore_by_name  # noqa: E402
from m3d.utils.h5_import import (  # noqa: E402
    export_reference_h5,
    import_reference_h5,
    infer_head_params_from_h5,
)


def _tiny_model(num_classes=2):
    cfg = Config(
        IMAGE_SIZE=64, IMAGE_DEPTH=8, NUM_CLASSES=num_classes,
        BACKBONE_STRIDES=[(4, 4, 1), (8, 8, 1), (16, 16, 1), (32, 32, 1),
                          (64, 64, 1)],
        RPN_ANCHOR_SCALES=(8, 12, 16, 24, 32),
        RPN_ANCHOR_RATIOS=[0.5, 1.0],
        FPN_CLASSIF_FC_LAYERS_SIZE=64, HEAD_CONV_CHANNEL=32,
        TOP_DOWN_PYRAMID_SIZE=32, POOL_SIZE=7, MASK_POOL_SIZE=14,
    )
    model = MaskRCNN.from_config(cfg, mode="inference")
    return cfg, model, init_params(model, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def tiny():
    return _tiny_model()


def _leaves(tree):
    return traverse_util.flatten_dict(tree, sep="/")


def test_h5_roundtrip_exact(tiny, tmp_path):
    _, model, variables = tiny
    path = str(tmp_path / "weights.h5")
    export_reference_h5(variables, path)

    # Import into a differently-initialized tree: every leaf must be
    # recovered bit-exact (incl. the deconv kernel axis swap).
    fresh = init_params(model, jax.random.PRNGKey(7))
    merged, stats = import_reference_h5(fresh, path)

    assert stats["params"]["missing"] == 0, stats
    assert stats["params"]["skipped"] == 0, stats
    for key, want in _leaves(variables["params"]).items():
        got = _leaves(merged["params"])[key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=key)
    for key, want in _leaves(variables["batch_stats"]).items():
        got = _leaves(merged["batch_stats"])[key]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=key)


def test_infer_head_params(tiny, tmp_path):
    cfg, _, variables = tiny
    path = str(tmp_path / "weights.h5")
    export_reference_h5(variables, path)
    found = infer_head_params_from_h5(path)
    assert found["POOL_SIZE"] == int(cfg.POOL_SIZE)
    assert found["FPN_CLASSIF_FC_LAYERS_SIZE"] == 64
    assert found["HEAD_CONV_CHANNEL"] == 32
    assert found["NUM_CLASSES"] == 2
    assert found["TOP_DOWN_PYRAMID_SIZE"] == 32


def test_class_dim_slice_on_import(tmp_path):
    """A 3-class reference checkpoint loads into a 2-class model with the
    class dimension sliced (reference _load_head_with_class_slice,
    core/models.py:5064-5141)."""
    _, _, v3 = _tiny_model(num_classes=3)
    path = str(tmp_path / "w3.h5")
    export_reference_h5(v3, path)

    _, _, v2 = _tiny_model(num_classes=2)
    merged, stats = import_reference_h5(v2, path)
    assert stats["params"]["sliced"] >= 2  # class logits + mask at least

    src_logits = _leaves(v3["params"])
    dst_logits = _leaves(merged["params"])
    for key, got in dst_logits.items():
        if key.endswith("mrcnn_class_logits/kernel"):
            src_key = key
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(src_logits[src_key])[:, :2]
            )


def test_autoconfigure_heads_both_formats(tiny, tmp_path):
    """Config head widths adapt to checkpoint kernel shapes for both the
    msgpack and .h5 formats (reference core/models.py:5496-5502)."""
    from m3d.train.checkpoints import (autoconfigure_heads,
                                       infer_head_params, save_params)

    cfg, _, variables = tiny
    h5_path = str(tmp_path / "w.h5")
    mp_path = str(tmp_path / "w.msgpack")
    export_reference_h5(variables, h5_path)
    save_params(mp_path, variables)

    for path in (h5_path, mp_path):
        found = infer_head_params(path)
        assert found["POOL_SIZE"] == 7
        assert found["FPN_CLASSIF_FC_LAYERS_SIZE"] == 64
        assert found["NUM_CLASSES"] == 2

    stale = Config(FPN_CLASSIF_FC_LAYERS_SIZE=1024, HEAD_CONV_CHANNEL=256)
    overridden = autoconfigure_heads(stale, [mp_path], verbose=False)
    assert "FPN_CLASSIF_FC_LAYERS_SIZE" in overridden
    assert int(stale.FPN_CLASSIF_FC_LAYERS_SIZE) == 64
    assert int(stale.HEAD_CONV_CHANNEL) == 32


def test_load_params_dispatches_h5(tiny, tmp_path):
    """Trainers' *_WEIGHTS keys accept reference .h5 files directly."""
    _, model, variables = tiny
    path = str(tmp_path / "weights.h5")
    export_reference_h5(variables, path)

    tree, meta = load_params(path)
    assert meta["format"] == "keras_h5"
    fresh = init_params(model, jax.random.PRNGKey(3))
    merged, stats = restore_by_name(fresh, tree)
    assert stats["missing"] == 0
    flat_src = _leaves(variables["params"])
    flat_dst = _leaves(merged["params"])
    key = next(k for k in flat_src if k.endswith("mrcnn_class_conv1/kernel"))
    np.testing.assert_array_equal(np.asarray(flat_dst[key]),
                                  np.asarray(flat_src[key]))

"""Keras-H5 checkpoint interop (m3d/utils/h5_import.py).

Round-trips an m3d variables tree through the reference's H5 weight format
and back, exercising the same surgery paths the reference uses: by-name
merge across model variants, class-dim slicing, kernel-shape introspection
(core/models.py:4924-5338).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real-trunk builds + H5 roundtrips (~3 min)

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
        # Export subtracts the Keras/flax BN-eps delta from var, import adds
        # it back — bit-exactness of the round-trip is only up to one f32
        # add/sub pair on var leaves.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


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


def _keras231_fixture(path, variables):
    """Hand-author an H5 replicating Keras 2.3.1 save_weights layout exactly
    (reference core/models.py:1121-1413 builds):

    - top-level attrs: layer_names (ALL layers incl. weightless),
      keras_version, backend;
    - per-layer groups with a weight_names attr of b"...:0" names;
    - backbone/FPN/RPN layers directly named -> weight path owner == group;
    - mrcnn_* head layers wrapped in TimeDistributed -> the GROUP carries
      the meaningful name while the weight names inside use the wrapped
      layer's AUTO-GENERATED name (conv3d_N / dense_N /
      batch_normalization_N), nested as subgroups;
    - Conv3DTranspose kernels stored as (k,k,k,out,in).
    """
    from flax import traverse_util

    pflat = traverse_util.flatten_dict(variables["params"], sep="/")
    sflat = traverse_util.flatten_dict(
        variables.get("batch_stats", {}), sep="/")

    inv_param = {"scale": "gamma", "bias_bn": "beta"}
    layers = {}
    for key, val in pflat.items():
        layer, leaf = key.split("/")[-2], key.split("/")[-1]
        val = np.asarray(val)
        is_bn = leaf == "scale" or (leaf == "bias" and any(
            f"{key.rsplit('/', 1)[0]}/scale" == k for k in pflat))
        if leaf == "scale":
            leaf = "gamma"
        elif is_bn and leaf == "bias":
            leaf = "beta"
        elif leaf == "kernel" and "deconv" in layer:
            val = np.swapaxes(val, -1, -2)
        layers.setdefault(layer, {})[leaf] = val
    for key, val in sflat.items():
        layer, leaf = key.split("/")[-2], key.split("/")[-1]
        name = {"mean": "moving_mean", "var": "moving_variance"}[leaf]
        layers.setdefault(layer, {})[name] = np.asarray(val)

    order = ("kernel", "bias", "gamma", "beta", "moving_mean",
             "moving_variance")
    weightless = ["input_image", "input_image_meta", "anchors",
                  "pool_reshape", "mrcnn_class", "mrcnn_bbox",
                  "roi_align_classifier", "roi_align_mask", "ROI"]
    counters = {"conv3d": 0, "dense": 0, "batch_normalization": 0}

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [np.bytes_(n) for n in
                                  sorted(layers) + weightless]
        f.attrs["backend"] = np.bytes_("tensorflow")
        f.attrs["keras_version"] = np.bytes_("2.3.1")
        for name in sorted(layers):
            g = f.create_group(name)
            inner = name
            if name.startswith("mrcnn_"):
                # TimeDistributed wrapper: inner layer is auto-named.
                if "bn" in name:
                    kind = "batch_normalization"
                elif any(l.ndim == 2 for l in layers[name].values()):
                    kind = "dense"
                else:
                    kind = "conv3d"
                counters[kind] += 1
                inner = f"{kind}_{counters[kind]}"
            wnames = []
            for leaf in sorted(layers[name],
                               key=lambda x: order.index(x)):
                wn = f"{inner}/{leaf}:0"
                g.create_dataset(wn, data=layers[name][leaf])
                wnames.append(np.bytes_(wn))
            g.attrs["weight_names"] = wnames
        for name in weightless:
            g = f.create_group(name)
            g.attrs["weight_names"] = []
    return path


def test_keras231_timedistributed_layout_loads_fully(tiny, tmp_path):
    """A genuinely Keras-2.3.1-shaped file (TimeDistributed nesting,
    auto-named inner layers, weightless layers listed) must map 100% of
    res*/bn*/fpn_*/rpn_*/mrcnn_* leaves — the loader keys on the wrapper
    group name, as the reference's suffix surgery does
    (core/models.py:4924-5061)."""
    _, model, variables = tiny
    donor = init_params(model, jax.random.PRNGKey(11))
    path = str(tmp_path / "keras231.h5")
    _keras231_fixture(path, donor)

    fresh = init_params(model, jax.random.PRNGKey(7))
    merged, stats = import_reference_h5(fresh, path)

    assert stats["params"]["missing"] == 0, stats
    assert stats["params"]["skipped"] == 0, stats
    want = _leaves(donor["params"])
    got = _leaves(merged["params"])
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
    if "batch_stats" in donor:
        assert stats["batch_stats"].get("missing", 0) == 0, stats
        wb, gb = _leaves(donor["batch_stats"]), _leaves(
            merged["batch_stats"])
        from m3d.utils.h5_import import FLAX_BN_EPS, KERAS_BN_EPS

        for k in wb:
            want = np.asarray(wb[k])
            if k.endswith("/var"):
                # A genuine Keras file's variance pairs with eps=1e-3; the
                # importer folds the eps delta in so flax BN (eps=1e-5)
                # reproduces the Keras activations.
                want = want + np.float32(KERAS_BN_EPS - FLAX_BN_EPS)
            np.testing.assert_allclose(
                np.asarray(gb[k]), want, rtol=1e-6, err_msg=k)


def test_imported_bn_matches_keras_formula(tmp_path):
    """Activation-level interop: running the real BNRelu module on stats
    imported from a Keras-layout H5 must reproduce the Keras BatchNorm
    formula gamma*(x-mean)/sqrt(var+1e-3)+beta — the reference's BatchNorm
    inherits Keras' default epsilon=1e-3 (core/models.py:102-114) while
    flax uses 1e-5; the importer folds the difference into var."""
    import jax.numpy as jnp

    from m3d.models.backbone import BNRelu
    from m3d.utils.h5_import import load_keras_h5

    rng = np.random.RandomState(0)
    C = 8
    gamma = rng.rand(C).astype(np.float32) + 0.5
    beta = rng.randn(C).astype(np.float32)
    mean = rng.randn(C).astype(np.float32)
    # Include tiny variances — where the eps mismatch bites hardest.
    var = np.concatenate([
        rng.rand(C - 4).astype(np.float32) + 0.5,
        np.asarray([1e-4, 1e-3, 1e-2, 2.0], np.float32)])

    path = str(tmp_path / "bn.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("bn_test")
        wnames = []
        for leaf, arr in (("gamma", gamma), ("beta", beta),
                          ("moving_mean", mean), ("moving_variance", var)):
            wn = f"bn_test/{leaf}:0"
            g.create_dataset(wn, data=arr)
            wnames.append(np.bytes_(wn))
        g.attrs["weight_names"] = wnames
        f.attrs["layer_names"] = [np.bytes_("bn_test")]

    params, stats = load_keras_h5(path)
    x = rng.randn(2, 4, 4, 2, C).astype(np.float32)

    mod = BNRelu(name_bn="bn_test", train_bn=False, relu=False,
                 dtype=jnp.float32)
    variables = {
        "params": {"bn_test": {"scale": jnp.asarray(params["bn_test"]["scale"]),
                               "bias": jnp.asarray(params["bn_test"]["bias"])}},
        "batch_stats": {"bn_test": {
            "mean": jnp.asarray(stats["bn_test"]["mean"]),
            "var": jnp.asarray(stats["bn_test"]["var"])}},
    }
    got = np.asarray(mod.apply(variables, x))
    keras = gamma * (x - mean) / np.sqrt(var + 1e-3) + beta
    np.testing.assert_allclose(got, keras, rtol=1e-5, atol=1e-5)


def test_restore_casts_to_target_dtype():
    """A compact f16-stored checkpoint restores as the target's dtype
    (weights/bench_ckpt.f16.msgpack survives workspace resets; loading it
    must yield f32 params, mirroring Keras' cast-on-load)."""
    target = {"params": {"conv": {"kernel": np.zeros((3, 3), np.float32),
                                  "bias": np.zeros((3,), np.float32)}}}
    src = {"params": {"conv": {
        "kernel": np.full((3, 3), 0.5, np.float16),
        "bias": np.arange(3, dtype=np.float16)}}}
    merged, stats = restore_by_name(target, src)
    assert stats["loaded"] == 2
    k = merged["params"]["conv"]["kernel"]
    assert k.dtype == np.float32
    np.testing.assert_allclose(np.asarray(k), 0.5)


import os  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _manifest(name):
    import json

    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


def test_committed_keras231_fixture_imports(tiny):
    """Import the COMMITTED externally-written fixture
    (tests/fixtures/keras231_tiny.h5, written by
    scripts/make_keras231_fixture.py straight from the Keras-2.3.1 layout
    spec with no m3d involvement): every manifest weight must land, with
    exact values (modulo the documented BN eps fold and deconv swap)."""
    _, model, _ = tiny
    fresh = init_params(model, jax.random.PRNGKey(3))
    path = os.path.join(FIXDIR, "keras231_tiny.h5")
    merged, stats = import_reference_h5(fresh, path)
    manifest = _manifest("keras231_tiny.manifest.json")

    from flax import traverse_util

    pflat = traverse_util.flatten_dict(merged["params"], sep="/")
    sflat = traverse_util.flatten_dict(merged["batch_stats"], sep="/")

    leaf_map = {"gamma": "scale", "beta": "bias", "kernel": "kernel",
                "bias": "bias", "moving_mean": "mean",
                "moving_variance": "var"}
    checked = 0
    for key, info in manifest.items():
        layer, leaf = key.split("/")
        target = leaf_map[leaf]
        tree = sflat if leaf.startswith("moving") else pflat
        hits = [k for k in tree
                if k.split("/")[-2] == layer and k.split("/")[-1] == target]
        assert hits, f"fixture weight {key} not mapped"
        arr = np.asarray(tree[hits[0]], np.float64)
        expected = info["sum"]
        if leaf == "moving_variance":
            # import folds the Keras/flax eps difference into the variance
            from m3d.utils.h5_import import FLAX_BN_EPS, KERAS_BN_EPS

            expected += (KERAS_BN_EPS - FLAX_BN_EPS) * arr.size
        if leaf == "kernel" and "deconv" in layer:
            pass  # swap preserves the sum
        np.testing.assert_allclose(arr.sum(), expected, rtol=1e-5,
                                   err_msg=key)
        checked += 1
    assert checked == len(manifest) == 92


def test_committed_head_only_fixture_imports(tiny):
    """The reference's head-only dump format (model_weights/ nesting +
    head_meta, core/models.py:1990-2026) as a committed file: all mrcnn_*
    weights import; nothing else is touched."""
    _, model, _ = tiny
    fresh = init_params(model, jax.random.PRNGKey(5))
    path = os.path.join(FIXDIR, "keras231_tiny_head.h5")
    merged, stats = import_reference_h5(fresh, path)
    manifest = _manifest("keras231_tiny_head.manifest.json")

    from flax import traverse_util

    pflat = traverse_util.flatten_dict(merged["params"], sep="/")
    fresh_flat = traverse_util.flatten_dict(fresh["params"], sep="/")
    n_head = 0
    for k in pflat:
        layer = k.split("/")[-2]
        if layer.startswith("mrcnn_") and k.split("/")[-1] in (
                "kernel", "bias", "scale"):
            n_head += 1
        elif not layer.startswith("mrcnn_"):
            np.testing.assert_array_equal(
                np.asarray(pflat[k]), np.asarray(fresh_flat[k]),
                err_msg=f"non-head weight {k} must be untouched")
    assert len(manifest) == 50

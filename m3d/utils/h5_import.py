"""Keras-H5 checkpoint interop with the reference implementation.

The reference trains/ships weights as Keras H5 files, loaded with
``load_weights(by_name=True, skip_mismatch=True)`` and manipulated by a
weight-surgery toolkit (H5 kernel-shape introspection to auto-configure head
widths, suffix remapping, class-dim slicing — core/models.py:4924-5338).
Because every m3d layer keeps the reference layer names (res2a_branch2a,
fpn_p2, rpn_conv_shared1, mrcnn_class_conv1, ...), a user's existing .h5
checkpoints import directly into m3d param trees:

  variables, stats = import_reference_h5(variables, "rpn_best.h5")

Layout translation (Keras <-> flax):
  - Conv3D kernel  (k,k,k,in,out)      -> nn.Conv kernel, unchanged.
  - Conv3DTranspose kernel (k,k,k,out,in) -> nn.ConvTranspose (k,k,k,in,out):
    last two axes swapped.
  - Dense kernel   (in,out)            -> nn.Dense, unchanged.
  - BatchNorm gamma/beta               -> params .../scale, .../bias.
  - BatchNorm moving_mean/moving_variance -> batch_stats .../mean, .../var.

Name matching reuses ``checkpoints.restore_by_name`` (suffix matching +
class-dim slicing), so H5 files from *any* of the reference's three model
variants (RPN / HEAD / MaskRCNN) merge into any m3d variables tree, exactly
like the reference's cross-model by-name loads (core/models.py:4576,
5851-5856).

``infer_head_params_from_h5`` mirrors the reference's H5 introspection
(core/models.py:5144-5203): recover POOL_SIZE / classifier width / mask conv
width / class count from kernel shapes so configs auto-adapt to a checkpoint.

h5py ships with the image; everything degrades to a clear ImportError if not.
"""

from __future__ import annotations

import numpy as np

from m3d.train.checkpoints import restore_by_name


def _h5():
    import h5py

    return h5py


def _weight_root(f):
    return f["model_weights"] if "model_weights" in f else f


def _iter_layer_weights(f):
    """Yields (layer_name, weight_name, np.ndarray) for a Keras weights H5."""
    root = _weight_root(f)
    layer_names = [
        n.decode() if isinstance(n, bytes) else str(n)
        for n in root.attrs.get("layer_names", list(root.keys()))
    ]
    for lname in layer_names:
        if lname not in root:
            continue
        g = root[lname]
        wnames = g.attrs.get("weight_names", None)
        if wnames is None:
            # Fall back to walking datasets.
            items = []

            def visit(name, obj, _items=items):
                if hasattr(obj, "shape"):
                    _items.append(name)

            g.visititems(visit)
            wnames = items
        for wn in wnames:
            wn = wn.decode() if isinstance(wn, bytes) else str(wn)
            if wn in g:
                yield lname, wn, np.asarray(g[wn])


_BN_PARAM = {"gamma": "scale", "beta": "bias"}
_BN_STATS = {"moving_mean": "mean", "moving_variance": "var"}

# The reference's BatchNorm subclass inherits the Keras default epsilon=1e-3
# (core/models.py:102-114); m3d's flax BN uses 1e-5 (m3d/models/backbone.py).
# Importing a Keras H5 therefore folds the difference into the moving
# variance: (x-mean)/sqrt((var + 1e-3 - 1e-5) + 1e-5) == the Keras formula
# (x-mean)/sqrt(var + 1e-3) exactly. Export applies the inverse shift so a
# Keras consumer with eps=1e-3 reproduces m3d activations (the stored
# variance may then be slightly negative for tiny variances; Keras only ever
# adds its epsilon back before the sqrt, so this is benign).
KERAS_BN_EPS = 1e-3
FLAX_BN_EPS = 1e-5


def load_keras_h5(path: str):
    """Read a reference H5 into two nested trees keyed by layer name:
    ({layer: {param: arr}}, {layer: {stat: arr}}).

    The owner is the LAYER GROUP name, not the weight path's penultimate
    component: Keras 2.3.1 writes TimeDistributed-wrapped head layers
    (reference core/models.py:1121-1238) with the *wrapper's* meaningful
    name as the group ("mrcnn_class_conv1") while the weight names inside
    carry the auto-generated inner-layer name ("conv3d_12/kernel:0") —
    the nesting the reference's suffix-remap surgery exists to untangle
    (core/models.py:4924-5061). Directly-named layers (backbone/FPN/RPN)
    have group == path owner, so this rule covers both.
    """
    h5py = _h5()
    params: dict[str, dict[str, np.ndarray]] = {}
    stats: dict[str, dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        for layer, wname, arr in _iter_layer_weights(f):
            leaf = wname.split("/")[-1].split(":")[0]
            owner = layer
            if leaf in _BN_PARAM:
                params.setdefault(owner, {})[_BN_PARAM[leaf]] = arr
            elif leaf in _BN_STATS:
                if leaf == "moving_variance":
                    # Keras eps=1e-3 vs flax eps=1e-5 (see KERAS_BN_EPS).
                    arr = arr.astype(np.float32) + np.float32(
                        KERAS_BN_EPS - FLAX_BN_EPS)
                stats.setdefault(owner, {})[_BN_STATS[leaf]] = arr
            else:
                if leaf == "kernel" and "deconv" in owner:
                    arr = np.swapaxes(arr, -1, -2)
                params.setdefault(owner, {})[leaf] = arr
    return params, stats


def import_reference_h5(variables, path: str, skip_mismatch: bool = True,
                        class_slice: bool = True, verbose: bool = False):
    """Merge a reference H5 checkpoint into an m3d variables tree by name.

    Returns (variables, stats_dict) where stats_dict reports loaded /
    sliced / skipped / missing counts for params and batch_stats.
    """
    src_params, src_stats = load_keras_h5(path)
    out = dict(variables)
    merged_params, pstats = restore_by_name(
        variables["params"], src_params,
        skip_mismatch=skip_mismatch, class_slice=class_slice, verbose=verbose,
    )
    out["params"] = merged_params
    sstats = {}
    if "batch_stats" in variables and src_stats:
        merged_stats, sstats = restore_by_name(
            variables["batch_stats"], src_stats,
            skip_mismatch=skip_mismatch, class_slice=class_slice,
            verbose=verbose,
        )
        out["batch_stats"] = merged_stats
    return out, {"params": pstats, "batch_stats": sstats}


def infer_head_params_from_h5(path: str) -> dict:
    """Recover head hyperparameters from kernel shapes (reference
    _infer_head_params_from_h5, core/models.py:5144-5203).

    Returns any of: POOL_SIZE, FPN_CLASSIF_FC_LAYERS_SIZE,
    HEAD_CONV_CHANNEL, NUM_CLASSES, TOP_DOWN_PYRAMID_SIZE.
    """
    params, _ = load_keras_h5(path)
    found: dict = {}
    k = params.get("mrcnn_class_conv1", {}).get("kernel")
    if k is not None and k.ndim == 5:
        found["POOL_SIZE"] = int(k.shape[0])
        found["FPN_CLASSIF_FC_LAYERS_SIZE"] = int(k.shape[-1])
        found["TOP_DOWN_PYRAMID_SIZE"] = int(k.shape[-2])
    k = params.get("mrcnn_mask_conv1", {}).get("kernel")
    if k is not None and k.ndim == 5:
        found["HEAD_CONV_CHANNEL"] = int(k.shape[-1])
    k = params.get("mrcnn_class_logits", {}).get("kernel")
    if k is not None and k.ndim == 2:
        found["NUM_CLASSES"] = int(k.shape[-1])
    k = params.get("mrcnn_mask", {}).get("kernel")
    if k is not None and k.ndim == 5:
        found.setdefault("NUM_CLASSES", int(k.shape[-1]))
    return found


def export_reference_h5(variables, path: str):
    """Write an m3d variables tree as a reference-compatible Keras weights H5.

    Each named layer (leaf module) becomes one layer group with Keras-style
    weight names, letting reference tooling consume m3d-trained weights.
    """
    from flax import traverse_util

    h5py = _h5()
    pflat = traverse_util.flatten_dict(variables["params"], sep="/")
    sflat = traverse_util.flatten_dict(
        variables.get("batch_stats", {}), sep="/"
    )

    inv_param = {v: k for k, v in _BN_PARAM.items()}
    inv_stats = {v: k for k, v in _BN_STATS.items()}

    layers: dict[str, dict[str, np.ndarray]] = {}
    for key, val in pflat.items():
        parts = key.split("/")
        layer, leaf = parts[-2], parts[-1]
        val = np.asarray(val)
        if leaf in inv_param:
            leaf = inv_param[leaf]
        elif leaf == "kernel" and "deconv" in layer:
            val = np.swapaxes(val, -1, -2)
        layers.setdefault(layer, {})[leaf] = val
    for key, val in sflat.items():
        parts = key.split("/")
        layer, leaf = parts[-2], parts[-1]
        if leaf in inv_stats:
            val = np.asarray(val)
            if leaf == "var":
                # Inverse of the import-side eps fold (see KERAS_BN_EPS).
                val = val.astype(np.float32) - np.float32(
                    KERAS_BN_EPS - FLAX_BN_EPS)
            layers.setdefault(layer, {})[inv_stats[leaf]] = val

    order = ("kernel", "bias", "gamma", "beta", "moving_mean",
             "moving_variance")
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [
            np.bytes_(name) for name in sorted(layers)
        ]
        f.attrs["backend"] = np.bytes_("m3d")
        for name in sorted(layers):
            g = f.create_group(name)
            leaves = sorted(
                layers[name],
                key=lambda leaf: order.index(leaf) if leaf in order else 99,
            )
            wnames = []
            for leaf in leaves:
                wn = f"{name}/{leaf}:0"
                g.create_dataset(wn, data=layers[name][leaf])
                wnames.append(np.bytes_(wn))
            g.attrs["weight_names"] = wnames
    return path
